from .inspect import explain_str, has_broadcast_join, has_pushed_filters, codegen_stages

__all__ = ["explain_str", "has_broadcast_join", "has_pushed_filters", "codegen_stages"]
