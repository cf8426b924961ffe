"""Bucketed tables: the co-located fact-fact join (no shuffle).

At 100 TB the lineitem ⋈ orders join is the dominant shuffle; writing
both tables bucketed (+sorted) on the order key lets the sort-merge
join read matching buckets directly — zero Exchange in the plan. The
harness proves the mechanism at small scale; the layout decision is
identical at any scale.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from real_time_big_data_analytics_spark.sources.files import write_bucketed_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="rtba_buckets_")
    suffix = uuid.uuid4().hex[:8]
    names = {}
    for name, table, key in [
        ("orders", "orders", "o_orderkey"),
        ("lineitem", "lineitem", "l_orderkey"),
    ]:
        tbl = f"b_{name}_{suffix}"
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        write_bucketed_table(
            df, tbl, os.path.join(d, tbl), bucket_by=key, n_buckets=N_BUCKETS
        )
        names[name] = tbl
    yield names
    for tbl in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li = spark.table(bucketed["lineitem"]).hint("MERGE")
    orders = spark.table(bucketed["orders"]).hint("MERGE")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan  # buckets align: no shuffle


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed):
    li = spark.table(bucketed["lineitem"])
    orders = spark.table(bucketed["orders"])
    got = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
