"""Descriptor API surface the generated code touches. The shim never
uses C descriptors, so generated modules take the pure-Python branch
(attribute pokes on the FileDescriptorShim)."""

_USE_C_DESCRIPTORS = False


class Descriptor:  # placeholder: generated modules only isinstance-free poke
    pass


class FieldDescriptor:
    pass


class FileDescriptor:
    pass
