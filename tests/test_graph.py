"""Graph analytics: PageRank invariants (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_analytics_spark.operators import graph


def test_pagerank_invariants(spark, sf_dir):
    ranks = graph.trade_pagerank(spark, sf_dir).collect()
    n = len(ranks)
    assert n > 0
    floor = (1 - graph.DAMPING) / n
    for r in ranks:
        # every node keeps at least the teleport mass
        assert r.rank >= floor - 1e-9, (r.n_name, r.rank)
    total = sum(r.rank for r in ranks)
    # mass is conserved up to dangling-node leakage: never above 1,
    # never below the pure-teleport total
    assert floor * n - 1e-6 <= total <= 1.0 + 1e-6


def test_pagerank_deterministic(spark, sf_dir):
    a = sorted((r.n_name, r.rank) for r in graph.trade_pagerank(spark, sf_dir).collect())
    b = sorted((r.n_name, r.rank) for r in graph.trade_pagerank(spark, sf_dir).collect())
    assert a == b


def test_trade_edges_probabilities_normalized(spark, sf_dir):
    edges = graph.trade_edges(spark, sf_dir)
    outsum = edges.groupBy("src").agg(F.sum("w").alias("tot"))
    rows = outsum.collect()
    assert rows and all(r.tot > 0 for r in rows)
