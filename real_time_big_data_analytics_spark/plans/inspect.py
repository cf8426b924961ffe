"""Physical-plan inspection helpers (SURVEY.md §4).

The scale mandate is enforced here, not hoped for: operators assert
that filters reached the parquet scan (PushedFilters), small sides
broadcast (BroadcastHashJoin), and expressions stayed inside
whole-stage codegen. tests/test_plans.py pins these properties so a
regression that silently de-optimizes a plan fails CI.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    s = explain_str(df)
    return "PushedFilters: [" in s and "PushedFilters: []" not in s


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def codegen_stages(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees (AQE hides them in the
    simple plan until execution, so ask the codegen explain)."""
    s = explain_str(df, "codegen")
    return s.count("WholeStageCodegen subtree")
