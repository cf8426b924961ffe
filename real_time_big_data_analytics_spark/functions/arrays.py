"""Array-math expression builders for embedding columns.

All pure Catalyst higher-order functions (``zip_with`` / ``aggregate``)
— JVM-side, codegen'd, no Python UDF on the hot path (SURVEY.md §2.9
scale mandate). ``embedding`` is ``array<float>``; math is done in
double for precision.

At 100 TB scale these expressions run inside whole-stage codegen per
row with zero serialization cost, unlike a pandas-UDF dot product that
pays an Arrow round trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two float arrays (double accum)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def mean_pool(a: Column | str) -> Column:
    """Mean of the array elements (e.g. pooling a token-embedding list)."""
    a = _c(a)
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double")
    ) / F.size(a).cast("double")


def l2_sq_dist(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance between two float arrays (double
    accumulation) — the PQ/IVF training and ADC lookup metric."""
    diffs = F.zip_with(
        _c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)
