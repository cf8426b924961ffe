"""Python Data Source (Spark 4 API) — the modern extension point for
custom connectors (SURVEY.md §2.1 S4 extension).

The reference's ingestion is a hand-rolled line parser inside the
consumer (reference ConsumerESFinal.scala:50-51); the idiomatic Spark 4
equivalent of "bring your own format" is a ``pyspark.sql.datasource``
implementation: the engine plans one task per ``InputPartition`` and
each task pulls Arrow record batches from Python — batch-columnar the
whole way, never row pickling.

Scale notes:

- ``partitions()`` returns one split per data file, so a directory of
  N shards fans out to N parallel tasks exactly like a native scan.
- ``read()`` yields ``pyarrow.RecordBatch`` objects; the worker ships
  them to the JVM over Arrow IPC (the same fast path Pandas UDFs use).
- The class closes over NOTHING from this package (self-contained
  imports inside methods): executors can unpickle it even when the
  driver ran from a foreign cwd — the cloudpickle by-reference trap
  documented in the verify recipe.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

DOCS_SUBSET_SCHEMA = "doc_id bigint, lang string, n_chars bigint"


class _JsonlPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _JsonlDocsReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options["path"]

    def partitions(self):
        import os

        return [
            _JsonlPartition(os.path.join(self.dir, f))
            for f in sorted(os.listdir(self.dir))
            if f.endswith(".json") or f.endswith(".jsonl")
        ]

    def read(self, partition):
        import pyarrow.json as pj

        tbl = pj.read_json(partition.path)
        tbl = tbl.select(["doc_id", "lang", "n_chars"])
        for batch in tbl.to_batches():
            yield batch


class JsonlDocsDataSource(DataSource):
    """``spark.read.format("jsonl_docs").option("path", dir)`` — a
    partitioned, Arrow-batched JSONL reader for the documents table."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self) -> str:
        return DOCS_SUBSET_SCHEMA

    def reader(self, schema):
        return _JsonlDocsReader(self.options)


def read_documents_via_python_datasource(spark, jsonl_dir: str):
    """Register (idempotent) and scan the custom source."""
    spark.dataSource.register(JsonlDocsDataSource)
    return spark.read.format("jsonl_docs").option("path", jsonl_dir).load()
