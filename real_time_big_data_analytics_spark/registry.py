"""The harness contract: named queries + their DuckDB oracle twins.

Every operator from SURVEY.md §2 registers here as a ``Query``:
  fn  — (spark, sf_dir) -> DataFrame (the Spark-native implementation)
  sql — ANSI-SQL twin runnable by DuckDB over the same parquet tables
        (views: region nation customer supplier part orders lineitem
        events documents embeddings). ``None`` → rows-only check for
        genuinely non-SQL-expressible ops (LSH, ML scoring, custom
        stateful streaming).

Column names are aligned on both sides (the driver's compare sorts
columns by name before hashing). Final double aggregates are rounded
(functions/numeric.py) so engine-order-dependent floating summation
doesn't produce spurious last-ulp mismatches.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None = None
    tags: tuple[str, ...] = field(default=())


QUERIES: dict[str, Query] = {}


def register(name: str, fn, sql: str | None = None, tags: tuple[str, ...] = ()) -> None:
    if name in QUERIES:
        raise ValueError(f"duplicate query name {name!r}")
    QUERIES[name] = Query(fn=fn, sql=sql, tags=tags)


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import queries_batch  # noqa: F401
    from . import queries_parity  # noqa: F401
    from . import queries_text  # noqa: F401
    from . import queries_ml  # noqa: F401
    from . import queries_streaming  # noqa: F401


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(QUERIES)
