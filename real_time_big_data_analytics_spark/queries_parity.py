"""Registrations: P-series reference-parity codec/scoring ops (SURVEY.md §2.2)."""

from __future__ import annotations

from .operators import parity
from .registry import register

register(
    "p_csv_parse_pipeline",
    parity.csv_parse_pipeline,
    sql=parity.CSV_PARSE_PIPELINE_SQL,
    tags=("parity", "csv"),
)

register(
    "p_json_roundtrip",
    parity.json_roundtrip_analytics,
    sql=parity.JSON_ROUNDTRIP_SQL,
    tags=("parity", "json"),
)

# Model predictions in the output — rows-only; shape/verdict domain
# pinned by tests/test_parity.py.
register("p6_scored_parity_9col", parity.scored_parity_9col, tags=("parity", "ml"))
