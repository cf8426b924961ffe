"""Bloom-filter runtime-filter audit: guarantee flags, exact-count
agreement with a direct semi join, empty-build robustness, and
position-family bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_analytics_spark.operators import bloom
from real_time_big_data_analytics_spark.sources.tables import load_table


def test_guarantees_hold_and_counts_are_exact(spark, sf_dir):
    rows = {
        r.event_type: r
        for r in bloom.bloom_semijoin_prune_audit(spark, sf_dir).collect()
    }
    assert rows, "audit should produce one row per event type"
    for r in rows.values():
        assert r.no_false_negatives, f"{r.event_type}: bloom dropped a true member"
        assert r.fpp_ok, f"{r.event_type}: observed fpp above bound"

    # n_true must equal the plain exact semi join, independently computed
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    keys = (
        customer.where(F.col("c_mktsegment") == bloom.SEGMENT)
        .select(F.col("c_custkey").alias("user_id"))
        .distinct()
    )
    exact = {
        r.event_type: r.n
        for r in events.join(keys, "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for et, r in rows.items():
        assert r.n_true == exact.get(et, 0)


def test_empty_build_side_rejects_everything(spark, sf_dir):
    """A filter built from zero keys must pass no probe (and the
    empty word-map path — element_at on a 0-entry map — must not
    crash or null-poison the flags)."""
    rows = bloom.bloom_semijoin_prune_audit(
        spark, sf_dir, segment="NO_SUCH_SEGMENT"
    ).collect()
    assert rows
    for r in rows:
        assert r.n_true == 0
        assert r.no_false_negatives  # vacuously: no members to drop
        assert r.fpp_ok  # 0 observed false positives


def test_position_family_is_bounded_and_k_wide(spark):
    df = spark.range(100).select(*bloom._positions(F.col("id")))
    assert len(df.columns) == bloom.K_HASHES
    agg = df.agg(
        *[F.min(f"pos_{i}").alias(f"mn{i}") for i in range(bloom.K_HASHES)],
        *[F.max(f"pos_{i}").alias(f"mx{i}") for i in range(bloom.K_HASHES)],
    ).first()
    for i in range(bloom.K_HASHES):
        assert agg[f"mn{i}"] >= 0
        assert agg[f"mx{i}"] < bloom.M_BITS
