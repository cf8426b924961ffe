"""Graph analytics over the star schema — iterative PageRank
(SURVEY.md §2 [N] extensions; iterative-algorithm family alongside
``clustering.min_label_components``).

The graph: nation→nation trade edges, weight = revenue flowing from
the customer's nation to the supplier's nation
(lineitem ⋈ orders ⋈ customer ⋈ supplier — same join shape as
``q9_product_profit``). PageRank then ranks nations by where trade
revenue concentrates.

Execution shape: the edge aggregation collapses the fact table to a
nation×nation matrix (≤ 625 rows) and is ``localCheckpoint``-ed
once; the fixed-iteration rank recurrence then composes LAZILY into
a single Catalyst plan — five chained broadcast-join+agg steps over
the checkpointed KB-scale edge list, one job, no per-iteration
driver synchronization. At 100 TB the edge build dominates (one
fact-table pass); the iteration cost is the aggregated graph's size,
not the corpus's. For graphs too big to re-join lazily (billions of
edges), checkpoint per iteration exactly as ``min_label_components``
does — the recurrence is identical.

The DuckDB oracle unrolls the same five iterations as chained CTEs —
an exact cross-engine check of an iterative distributed algorithm
(final ranks rounded at 1e-6; the recurrence itself is never
rounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import round2
from ..sources.tables import load_table

DAMPING = 0.85
N_ITER = 5


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w): revenue from customer-nation src to
    supplier-nation dst."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.sum(rev).alias("w"))
    )


def trade_pagerank(
    spark: SparkSession,
    sf_dir: str,
    n_iter: int = N_ITER,
    damping: float = DAMPING,
) -> DataFrame:
    """Weighted PageRank over the nation trade graph, ``n_iter`` fixed
    iterations: rank_{t+1}(v) = (1-d)/N + d·Σ_{u→v} rank_t(u)·w(u,v)/outw(u).

    Returns (n_name, rank) for every nation, rank rounded at 1e-6.
    Nations with no inbound trade keep the teleport term only.
    """
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node")).localCheckpoint()
    n_nodes = nodes.count()

    # normalized transition probabilities, materialized once
    edges = trade_edges(spark, sf_dir)
    out_w = Window.partitionBy("src")
    trans = edges.select(
        "src", "dst", (F.col("w") / F.sum("w").over(out_w)).alias("p")
    ).localCheckpoint()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(n_iter):
        inbound = (
            trans.join(ranks, trans.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
        )
        ranks = nodes.join(inbound, nodes.node == inbound.dst, "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
            ).alias("rank"),
        )

    return (
        ranks.join(F.broadcast(nation), ranks.node == nation.n_nationkey)
        .select(
            F.col("n_name"), round2(F.col("rank"), 6).alias("rank")
        )
    )
