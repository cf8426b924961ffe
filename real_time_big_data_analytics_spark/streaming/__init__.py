from .runner import events_stream, run_to_table

__all__ = ["events_stream", "run_to_table"]
