"""Registrations: ML train/score parity ops (SURVEY.md §2.10)."""
