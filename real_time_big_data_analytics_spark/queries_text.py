"""Registrations: LLM-data-pipeline text/dedup/similarity ops (SURVEY.md §2.9)."""
