"""The generated-code builder hooks: descriptor placeholders first
(so `_globals["_MSG"]._serialized_start = ...` pokes land somewhere),
then the real message classes (_shim_core.build_messages)."""

from .. import _shim_core


class _DescriptorHandle:
    """Accepts the attribute pokes generated modules make."""


def _handles(msg: dict, prefix: str, out: dict) -> None:
    key = f"{prefix}_{msg['name'].upper()}" if prefix else f"_{msg['name'].upper()}"
    out[key] = _DescriptorHandle()
    for en in msg["enums"]:
        out[f"{key}_{en['name'].upper()}"] = _DescriptorHandle()
    for nested in msg["nested"]:
        _handles(nested, key, out)


def BuildMessageAndEnumDescriptors(file_des, globals_dict) -> None:
    for msg in file_des.parsed["messages"]:
        _handles(msg, "", globals_dict)
    for en in file_des.parsed["enums"]:
        globals_dict[f"_{en['name'].upper()}"] = _DescriptorHandle()


def BuildTopDescriptorsAndMessages(file_des, module_name, globals_dict) -> None:
    _shim_core.build_messages(file_des, globals_dict)
