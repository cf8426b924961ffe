"""Numeric expression helpers.

Aggregates over doubles are computed natively (JVM-side, partial
map-side aggregation) and only the *final* reported value is rounded,
so results are oracle-comparable across engines whose floating-point
summation order differs (Spark partial aggs vs DuckDB) without
giving up whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round2(col: Column | str, scale: int = 2) -> Column:
    """Round a final (post-aggregation) double column for stable output."""
    return F.round(col if isinstance(col, Column) else F.col(col), scale)
