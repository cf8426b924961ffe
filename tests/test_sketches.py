"""Sketch aggregates: error bounds vs exact answers; salted agg parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_analytics_spark.operators import sketches, skew
from real_time_big_data_analytics_spark.sources.tables import load_table


def test_hll_within_error_bound(spark, sf_dir):
    rows = sketches.distinct_user_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err <= 0.05, f"{r.event_type}: {r.approx_users} vs {r.exact_users}"


def test_quantile_sketch_brackets_exact(spark, sf_dir):
    approx = {
        r.event_type: r for r in sketches.value_quantile_sketch(spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    for et, a in approx.items():
        spread = max(abs(exact[et].p95), 1.0)
        assert abs(a.p50 - exact[et].p50) / spread < 0.05
        assert abs(a.p95 - exact[et].p95) / spread < 0.05


def test_salted_equals_unsalted(spark, sf_dir):
    """The salted two-phase plan must be result-identical to the
    direct groupBy (algebraic combine)."""
    salted = {r.user_id: r for r in skew.salted_user_stats(spark, sf_dir).collect()}
    events = load_table(spark, sf_dir, "events")
    direct = {
        r.user_id: r
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert set(salted) == set(direct)
    for uid, r in salted.items():
        assert r.n_events == direct[uid].n_events


def test_frequent_words_sketch_recovers_exact_topk(spark, sf_dir):
    """At harness scale the sketch must contain the exact top-10 and
    estimate their counts exactly (no collisions in a small stream)."""
    from real_time_big_data_analytics_spark.operators import text

    exact = {r.word: r.n for r in text.word_topk(spark, sf_dir, k=10).collect()}
    approx = {
        r.word: r.est_n
        for r in sketches.frequent_words_sketch(spark, sf_dir, k=30).collect()
    }
    missing = set(exact) - set(approx)
    assert not missing, f"sketch missed {missing}"
    for w, n in exact.items():
        assert abs(approx[w] - n) <= max(1, n * 0.02)


def test_theta_intersection_within_error(spark, sf_dir):
    r = sketches.theta_user_overlap(spark, sf_dir).collect()[0]
    assert r.exact_both > 0
    assert abs(r.approx_both - r.exact_both) / r.exact_both <= 0.05


def test_countmin_words_matches_hashlib_replay(spark, sf_dir):
    """CM estimates must equal a hashlib/dict replay (same salted
    hashes, same min-over-rows), and the structural guarantee must
    hold: estimate >= true count for every audited word."""
    import hashlib
    from collections import Counter, defaultdict

    from real_time_big_data_analytics_spark.operators import sketches as sk
    from real_time_big_data_analytics_spark.sources.tables import load_table

    rows = {r.w: r for r in sk.countmin_words(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("text").toPandas()
    counts = Counter(
        w for t in docs.text for w in t.lower().split(" ") if w
    )
    cm = defaultdict(int)
    for w, c in counts.items():
        for r in range(sk.CM_DEPTH):
            b = (
                int(hashlib.md5(f"cm{r}|{w}".encode()).hexdigest()[:8], 16)
                % sk.CM_WIDTH
            )
            cm[(r, b)] += c
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: sk.CM_TOPK]
    assert set(rows) == {w for w, _ in top}
    for w, c in top:
        est = min(
            cm[(
                r,
                int(hashlib.md5(f"cm{r}|{w}".encode()).hexdigest()[:8], 16)
                % sk.CM_WIDTH,
            )]
            for r in range(sk.CM_DEPTH)
        )
        r_ = rows[w]
        assert r_.true_count == c
        assert r_.cm_estimate == est
        assert r_.never_under and est >= c
        assert r_.overestimate == est - c
