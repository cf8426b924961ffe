"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``real_time_big_data_analytics_spark.registry`` — every
operator from SURVEY.md §2 registers there with its Spark
implementation and (where SQL-expressible) its DuckDB oracle twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_big_data_analytics_spark.registry import all_queries

_FLAGSHIP = "flagship_windowed_analytics"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()[_FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: q.sql for name, q in all_queries().items() if q.sql is not None}
