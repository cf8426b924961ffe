from ._shim_core import ShimMessage as Message


class Error(Exception):
    pass


class DecodeError(Error):
    pass


class EncodeError(Error):
    pass
