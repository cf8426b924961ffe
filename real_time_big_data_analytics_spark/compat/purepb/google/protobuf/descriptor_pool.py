from . import _shim_core


class DescriptorPool:
    def __init__(self):
        self._files = {}

    def AddSerializedFile(self, blob: bytes):
        parsed = _shim_core.parse_file_descriptor(blob)
        fd = _shim_core.FileDescriptorShim(parsed, blob)
        self._files[fd.name] = fd
        return fd


_DEFAULT = DescriptorPool()


def Default() -> DescriptorPool:
    return _DEFAULT
