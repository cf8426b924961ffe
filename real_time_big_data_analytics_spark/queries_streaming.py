"""Registrations: Structured Streaming ops (SURVEY.md §2.8)."""
