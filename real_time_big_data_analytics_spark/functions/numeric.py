"""Numeric expression helpers.

Aggregates over doubles are computed natively (JVM-side, partial
map-side aggregation) and only the *final* reported value is rounded,
so results are oracle-comparable across engines whose floating-point
summation order differs (Spark partial aggs vs DuckDB) without
giving up whole-stage codegen.

``round2`` deliberately does NOT use Spark's ``F.round``: Spark
rounds HALF_UP on the double's shortest decimal representation
(BigDecimal semantics), while DuckDB/C++ round the raw binary double
(``std::round(x * 10^s) / 10^s``) — they disagree on exact-tie values
(0.53875 → 0.5388 vs 0.5387). We replicate the C++ semantics with the
same IEEE double operations, so Spark and the DuckDB oracle produce
bit-identical rounded values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round2(col: Column | str, scale: int = 2) -> Column:
    """Round a final (post-aggregation) double column for stable
    output, bit-compatible with DuckDB's ``round(double, s)``
    (half-away-from-zero on the binary value)."""
    c = (col if isinstance(col, Column) else F.col(col)).cast("double")
    p = c * F.lit(float(10**scale))
    n = F.when(p >= 0, F.floor(p + F.lit(0.5))).otherwise(F.ceil(p - F.lit(0.5)))
    return n.cast("double") / F.lit(float(10**scale))
