"""DuckDB-oracle equivalence at smoke scale for every SQL-expressible
query — a fast local replica of the driver's t2 gate (full-scale run:
``python tools/check.py --sf /root/testdata/sf0.01``)."""

from __future__ import annotations

import pytest

from real_time_big_data_analytics_spark.registry import all_queries
from tools.check import compare, duck_connection

QUERIES = {n: q for n, q in all_queries().items() if q.sql is not None}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_matches_oracle(spark, sf_dir, duck, name):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    odf = duck.execute(q.sql).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"
