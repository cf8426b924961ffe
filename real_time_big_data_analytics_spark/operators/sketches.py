"""Sketch aggregates: HLL cardinality and quantile digests
(SURVEY.md §2.9 L4 profiling; north-star scale family).

Exact ``count(DISTINCT ...)`` and exact percentiles need a full
shuffle of the distinct values / a global sort; the sketch versions
are single-pass, mergeable, constant-memory — the only viable shape
at 100 TB:

- ``approx_count_distinct`` — HyperLogLog++, ~2% default error,
  merge-able across partitions map-side.
- ``percentile_approx`` — a t-digest-like quantile summary with an
  accuracy/space knob.

Sketch outputs are estimator-specific, so the harness check is
rows-only; tests/test_sketches.py pins the error bound against the
exact answers (the meaningful notion of sketch correctness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import round2
from ..sources.tables import load_table

QUANTILES = [0.5, 0.95, 0.99]
PERCENTILE_ACCURACY = 10000


def distinct_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-user estimate per event type, next to the exact
    count baseline the error-bound test compares against."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of ``value`` per event type."""
    events = load_table(spark, sf_dir, "events")
    qcols = [
        round2(
            F.percentile_approx("value", F.lit(q), F.lit(PERCENTILE_ACCURACY))
        ).alias(f"p{int(q * 100)}")
        for q in QUANTILES
    ]
    return events.groupBy("event_type").agg(*qcols, F.count("*").alias("n"))


def frequent_words_sketch(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Approximate heavy hitters: ``approx_top_k`` over the token
    stream — single-pass, mergeable, bounded memory, vs. the exact
    top-k's full word-count shuffle (text.word_topk). At 100 TB the
    sketch is the only way to get corpus-wide heavy hitters in one
    pass; the recall test pins its accuracy against the exact answer.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    topk = words.agg(F.expr(f"approx_top_k(word, {k})").alias("tk"))
    return topk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("word"), F.col("e.count").alias("est_n")
    )


def theta_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra: |users with clicks ∩ users with
    purchases| estimated from two mergeable sketches, next to the
    exact intersection count the error-bound test compares against.

    Theta sketches support union/intersection/difference on the
    SKETCHES (constant size), so at 100 TB the per-segment sketches
    aggregate map-side and set arithmetic happens on kilobytes — the
    only viable shape for cross-segment audience overlap.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    sk = clicks.agg(F.expr("theta_sketch_agg(user_id)").alias("s_click")).crossJoin(
        purchases.agg(F.expr("theta_sketch_agg(user_id)").alias("s_buy"))
    )
    approx = sk.select(
        F.expr(
            "theta_sketch_estimate(theta_intersection(s_click, s_buy))"
        ).cast("bigint").alias("approx_both")
    )
    exact = (
        clicks.select("user_id")
        .intersect(purchases.select("user_id"))
        .agg(F.count("*").alias("exact_both"))
    )
    return approx.crossJoin(exact)
