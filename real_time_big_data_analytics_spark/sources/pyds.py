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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

DOCS_SUBSET_SCHEMA = "doc_id bigint, lang string, n_chars bigint"


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


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


class _JsonlDocsWriter(DataSourceWriter):
    """Batch write path: each task writes its partition to a TEMP
    file and returns a commit message; only the driver-side
    ``commit()`` publishes (atomic rename) — so failed or speculative
    task attempts never leave partial output visible, the same
    task-commit protocol native file sinks use. Local-fs paths match
    the reader's harness assumption; at production scale the same
    protocol targets shared storage."""

    def __init__(self, options):
        self.dir = options["path"]

    def write(self, iterator):
        import json
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp = os.path.join(self.dir, f"_tmp_part-{pid:05d}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        {
                            "doc_id": row.doc_id,
                            "lang": row.lang,
                            "n_chars": row.n_chars,
                        }
                    )
                    + "\n"
                )
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages):
        import os

        for m in messages:
            os.replace(
                m.path,
                m.path.replace("_tmp_part-", "part-"),
            )
        with open(os.path.join(self.dir, "_SUCCESS"), "w") as f:
            f.write(str(sum(m.n for m in messages)))

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonlDocsDataSource(DataSource):
    """``spark.read.format("jsonl_docs").option("path", dir)`` — a
    partitioned, Arrow-batched JSONL reader for the documents table,
    plus the matching batch WRITER (``df.write.format("jsonl_docs")``)
    with temp-file/rename task-commit semantics."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self) -> str:
        return DOCS_SUBSET_SCHEMA

    def reader(self, schema):
        return _JsonlDocsReader(self.options)

    def writer(self, schema, overwrite):
        import os

        d = self.options["path"]
        os.makedirs(d, exist_ok=True)
        if overwrite:
            for f in os.listdir(d):
                if f.endswith(".jsonl") or f == "_SUCCESS":
                    os.remove(os.path.join(d, f))
        return _JsonlDocsWriter(self.options)


def read_documents_via_python_datasource(spark, jsonl_dir: str):
    """Register (idempotent) and scan the custom source."""
    spark.dataSource.register(JsonlDocsDataSource)
    return spark.read.format("jsonl_docs").option("path", jsonl_dir).load()


def make_jsonl_docs_stream_datasource():
    """Build the STREAMING twin of :class:`JsonlDocsDataSource` —
    offset-managed reads of the same JSONL shards, one file per
    micro-batch.

    The classes are defined at FUNCTION scope on purpose: Spark runs
    streaming-source planning in a dedicated Python runner process
    (``python_streaming_source_runner``) that unpickles the
    DataSource; a module-level class pickles BY REFERENCE and that
    runner — unlike executor workers — does not see the
    addPyFile-shipped package zip, so it dies with
    ModuleNotFoundError when the driver runs from a foreign cwd.
    Function-scope classes are pickled BY VALUE (only pyspark/pyarrow
    imports remain, which every worker has). Verified under the
    vanilla-session foreign-cwd sweep.

    The simple-reader API is driver-prefetched rows (right for
    harness-sized shards and for demonstrating offset/commit
    semantics); the partition-planned ``DataSourceStreamReader`` is
    the fan-out path at production scale, exactly like the batch
    ``partitions()`` above. Offsets are ``{"idx": n}`` — files are
    the replayable log, so recovery re-reads from the committed index
    like a Kafka offset seek.
    """

    class _JsonlDocsStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.dir = options["path"]

        def _files(self):
            import os

            return [
                os.path.join(self.dir, f)
                for f in sorted(os.listdir(self.dir))
                if f.endswith(".json") or f.endswith(".jsonl")
            ]

        def initialOffset(self):
            return {"idx": 0}

        def read(self, start):
            i = start["idx"]
            files = self._files()
            if i >= len(files):
                return iter([]), {"idx": i}
            import pyarrow.json as pj

            tbl = pj.read_json(files[i]).select(["doc_id", "lang", "n_chars"])
            rows = list(
                zip(*(tbl.column(c).to_pylist() for c in ("doc_id", "lang", "n_chars")))
            )
            return iter(rows), {"idx": i + 1}

        def readBetweenOffsets(self, start, end):
            rows, _ = self.read(start)
            return rows

        def commit(self, end):
            pass

    class JsonlDocsStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "jsonl_docs_stream"

        def schema(self) -> str:
            return "doc_id bigint, lang string, n_chars bigint"

        def simpleStreamReader(self, schema):
            return _JsonlDocsStreamReader(self.options)

    return JsonlDocsStreamDataSource


def stream_documents_via_python_datasource(spark, jsonl_dir: str):
    """Register (idempotent) and open the streaming scan."""
    spark.dataSource.register(make_jsonl_docs_stream_datasource())
    return spark.readStream.format("jsonl_docs_stream").option("path", jsonl_dir).load()


def write_documents_via_python_datasource(spark, df, out_dir: str):
    """Register (idempotent) and write through the custom sink."""
    spark.dataSource.register(JsonlDocsDataSource)
    (
        df.write.format("jsonl_docs")
        .mode("overwrite")
        .option("path", out_dir)
        .save()
    )
