"""ER family: blocking invariants, canonical pair order, hot-block
cap, closure consistency (SURVEY.md §5.2 property checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_analytics_spark.operators import entity_resolution as er
from real_time_big_data_analytics_spark.sources.tables import load_table


def test_pairs_are_canonical_and_within_threshold(spark, sf_dir):
    pairs = er.candidate_pairs(spark, sf_dir).collect()
    assert pairs, "fixture should produce candidate pairs"
    for r in pairs:
        assert r.a_custkey < r.b_custkey
        assert 0 <= r.name_dist <= er.CANDIDATE_DIST
        assert r.bal_gap >= 0


def test_pairs_never_cross_blocks(spark, sf_dir):
    """Every candidate pair shares its (nation, segment) block key —
    the structural guarantee that candidate generation is Σ k_b²,
    not n²."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    joined = (
        er.candidate_pairs(spark, sf_dir)
        .join(cust.withColumnRenamed("c_custkey", "a_custkey"), "a_custkey")
        .withColumnRenamed("c_nationkey", "a_nat")
        .withColumnRenamed("c_mktsegment", "a_seg")
        .join(cust.withColumnRenamed("c_custkey", "b_custkey"), "b_custkey")
    )
    crossing = joined.filter(
        (F.col("a_nat") != F.col("c_nationkey"))
        | (F.col("a_seg") != F.col("c_mktsegment"))
    ).count()
    assert crossing == 0


def test_hot_block_cap_drops_oversized_blocks(spark, sf_dir):
    """With the cap forced below every block size, no pairs survive —
    the skew guard actually gates generation."""
    assert er.candidate_pairs(spark, sf_dir, max_block=1).count() == 0


def test_lossless_band_join_equals_naive_all_pairs(spark, sf_dir):
    """The length-band replication join must produce EXACTLY the naive
    all-pairs result — the losslessness contract, checked in-engine
    (the registered oracle re-checks it against DuckDB)."""
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in er.lossless_fuzzy_name_pairs(spark, sf_dir).collect()
    }
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .count()
    )
    a, b = names.alias("a"), names.alias("b")
    naive = {
        (r.name_a, r.name_b, r.dist)
        for r in a.join(b, F.col("a.name") < F.col("b.name"))
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein("a.name", "b.name").cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= er.CANDIDATE_DIST)
        .collect()
    }
    assert got == naive
    assert got, "fixture should contain near-duplicate part names"


def test_lossless_pairs_canonical(spark, sf_dir):
    for r in er.lossless_fuzzy_name_pairs(spark, sf_dir).collect():
        assert r.name_a < r.name_b
        assert 0 <= r.dist <= er.CANDIDATE_DIST
        assert r.n_parts_a >= 1 and r.n_parts_b >= 1


def test_clusters_are_closed_over_match_pairs(spark, sf_dir):
    """Both endpoints of every confident match pair carry the same
    entity label, and every representative labels itself."""
    labels = {
        r.c_custkey: r.entity_rep
        for r in er.entity_clusters(spark, sf_dir).collect()
    }
    match_pairs = er.candidate_pairs(
        spark, sf_dir, max_dist=er.MATCH_DIST
    ).collect()
    assert match_pairs
    for r in match_pairs:
        assert labels[r.a_custkey] == labels[r.b_custkey]
    for node, rep in labels.items():
        assert labels[rep] == rep
        assert rep <= node


def test_no_cartesian_in_pair_plan(spark, sf_dir):
    plan = er.candidate_pairs(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_blocking_quality_bounds_and_consistency(spark, sf_dir):
    """Scorecard invariants: found is a subset of truth (completeness
    <= 1), blocked_compared matches the direct per-block C(k,2) sum,
    and reduction ratio reflects the ~1/B block fanout."""
    from pyspark.sql import functions as F

    from real_time_big_data_analytics_spark.operators import (
        entity_resolution as er,
    )
    from real_time_big_data_analytics_spark.sources.tables import load_table

    r = er.blocking_quality(spark, sf_dir).first()
    sizes = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("bn"))
        .collect()
    )
    blocked = sum(s.bn * (s.bn - 1) // 2 for s in sizes if s.bn <= er.MAX_BLOCK)
    n = sum(s.bn for s in sizes)
    assert r.n_records == n
    assert r.blocked_compared == blocked
    assert r.all_pairs == n * (n - 1) // 2
    assert 0.0 <= r.pair_completeness <= 1.0
    assert r.found_matches <= r.truth_matches
    assert abs(r.reduction_ratio - (1 - blocked / r.all_pairs)) < 1e-5
    # 125 block keys -> reduction should be >= 0.9
    assert r.reduction_ratio > 0.9
