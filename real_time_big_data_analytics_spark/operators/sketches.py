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

Sketch outputs are estimator-specific, so a value-hash against an
exact SQL oracle can never match. The harness-checkable form is the
``*_checked`` bound-assertion twin of each sketch: one plan computes
BOTH the sketch estimate and the exact answer and emits
(keys…, exact…, within_bound) where ``within_bound`` asserts the
estimator's documented error bound; the DuckDB oracle emits the same
rows from the exact computation with ``within_bound = true``. The
hash matches iff the sketch meets its bound — the meaningful notion
of sketch correctness, and an exact comparison. tests/test_sketches.py
additionally pins the raw estimators' error bounds.
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


# Error tolerances asserted by the *_checked twins. HLL++ at default
# rsd and theta sketches at default lgK sit well inside 5% on the
# harness cardinalities; approx_top_k tracks far more than k items so
# heavy-hitter counts are near-exact (2%); percentile_approx at
# accuracy 10000 bounds rank error at n/10000.
HLL_REL_TOL = 0.05
# percentile_approx's guarantee is in RANK space (rank error ≤
# n/accuracy, plus 1 rank of discretization — the sketch returns an
# actual data value while exact percentile() interpolates). 0.02
# covers both comfortably at any n ≥ 50.
QUANTILE_RANK_EPS = 0.02
TOPK_REL_TOL = 0.02
THETA_REL_TOL = 0.05


def distinct_users_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound-assertion twin of ``distinct_user_sketch`` (see module
    docstring): emits (event_type, exact_users, within_bound)."""
    est = distinct_user_sketch(spark, sf_dir)
    ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.greatest(F.col("exact_users"), F.lit(1))
    ) <= HLL_REL_TOL
    return est.select("event_type", "exact_users", ok.alias("within_bound"))


def value_quantiles_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound-assertion twin of ``value_quantile_sketch``: the
    approximate p50/p95/p99 must each land inside the exact-percentile
    bracket [percentile(q − ε), percentile(q + ε)] with
    ε = QUANTILE_RANK_EPS — rank space is where the sketch's guarantee
    actually lives (value-space tolerances break on heavy tails /
    small groups). One aggregation computes sketch and exact sides
    together — a single shuffle of pre-aggregated partials."""
    events = load_table(spark, sf_dir, "events")
    eps = QUANTILE_RANK_EPS
    aggs = [
        F.percentile_approx("value", F.lit(q), F.lit(PERCENTILE_ACCURACY)).alias(
            f"a{int(q * 100)}"
        )
        for q in QUANTILES
    ]
    for q in QUANTILES:
        p = int(q * 100)
        aggs.append(F.expr(f"percentile(value, {max(q - eps, 0.0)})").alias(f"lo{p}"))
        aggs.append(F.expr(f"percentile(value, {min(q + eps, 1.0)})").alias(f"hi{p}"))
    df = events.groupBy("event_type").agg(*aggs, F.count("*").alias("n"))
    oks = [
        (
            (F.col(f"a{p}") >= F.col(f"lo{p}")) & (F.col(f"a{p}") <= F.col(f"hi{p}"))
        ).alias(f"ok{p}")
        for p in (50, 95, 99)
    ]
    return df.select("event_type", "n", *oks)


def frequent_words_checked(
    spark: SparkSession, sf_dir: str, k: int = 10, sketch_k: int = 20
) -> DataFrame:
    """Bound-assertion twin of ``frequent_words_sketch``: every exact
    top-``k`` word must appear in the sketch's top-``sketch_k`` with
    its count estimated within TOPK_REL_TOL. The exact side's
    deterministic order (n desc, word asc) makes the row set stable;
    the 10-row × 20-row join is driver-trivial at any corpus size
    (both sides are k-bounded aggregates)."""
    from .text import word_topk

    exact_top = word_topk(spark, sf_dir, k=k)
    sketch = frequent_words_sketch(spark, sf_dir, k=sketch_k)
    joined = exact_top.join(F.broadcast(sketch), "word", "left")
    ok = F.col("est_n").isNotNull() & (
        F.abs(F.col("est_n") - F.col("n"))
        <= F.greatest(F.lit(1.0), F.col("n") * TOPK_REL_TOL)
    )
    return joined.select("word", F.col("n").alias("exact_n"), ok.alias("within_bound"))


def theta_overlap_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound-assertion twin of ``theta_user_overlap``: the sketch
    intersection estimate must sit within THETA_REL_TOL of the exact
    |clicks ∩ purchases| computed in the same plan."""
    df = theta_user_overlap(spark, sf_dir)
    ok = (
        F.abs(F.col("approx_both") - F.col("exact_both"))
        / F.greatest(F.col("exact_both"), F.lit(1))
    ) <= THETA_REL_TOL
    return df.select("exact_both", ok.alias("within_bound"))


# --- Count-Min sketch ----------------------------------------------------

CM_DEPTH = 4  # hash rows
CM_WIDTH = 256  # buckets per row
CM_TOPK = 20  # audited words


def countmin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over the corpus
    word stream, built RELATIONALLY: CM_DEPTH salted md5 hash rows x
    CM_WIDTH buckets, each cell one grouped sum — a single
    vocab-grain pass, mergeable map-side like every other sketch
    here. The point-query estimate for a word is min over rows of its
    cell, audited for the CM_TOPK most frequent words against their
    exact counts: the sketch NEVER underestimates (structural), and
    the overestimate is the collision mass the output makes visible.

    Unlike the HLL/quantile sketches (estimator-specific internals,
    bound-assertion twins), a relational CM sketch is DETERMINISTIC
    given the hash salts — so every column here, including the
    estimates themselves, is hash-checked against the DuckDB replay.

    Scale shape: cell building is one grouped sum at vocab grain;
    the audit joins the CM_TOPK true top words (TakeOrdered) to their
    DEPTH cells — k*depth rows of broadcast-scale lookup.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )

    def bucket(row: int):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"cm{row}|"), F.col("w"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % CM_WIDTH
        )

    cells = None
    for r in range(CM_DEPTH):
        part = words.select(
            F.lit(r).alias("row"), bucket(r).alias("bucket"), "c"
        )
        cells = part if cells is None else cells.unionByName(part)
    cm = cells.groupBy("row", "bucket").agg(F.sum("c").alias("cell"))
    top = (
        words.orderBy(F.desc("c"), F.asc("w"))
        .limit(CM_TOPK)
        .select("w", F.col("c").alias("true_count"))
    )
    lookups = None
    for r in range(CM_DEPTH):
        part = top.select(
            "w", "true_count", F.lit(r).alias("row"), bucket(r).alias("bucket")
        )
        lookups = part if lookups is None else lookups.unionByName(part)
    est = (
        lookups.join(F.broadcast(cm), ["row", "bucket"])
        .groupBy("w", "true_count")
        .agg(F.min("cell").cast("bigint").alias("cm_estimate"))
    )
    return est.select(
        "w",
        F.col("true_count").cast("bigint").alias("true_count"),
        "cm_estimate",
        (F.col("cm_estimate") - F.col("true_count")).alias("overestimate"),
        (F.col("cm_estimate") >= F.col("true_count")).alias("never_under"),
    )
