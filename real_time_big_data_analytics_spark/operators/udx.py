"""U-series user-defined-function surface (SURVEY.md §2.9).

The reference's only user code run per record is the closure-captured
model predict and tuple mappers (reference ConsumerESFinal.scala:70-83);
the rebuild keeps hot paths on built-in Catalyst expressions and
reserves Python for the four sanctioned vectorized surfaces:

- ``mapInPandas``            — operators/multimodal.py (decode stages)
- ``applyInPandasWithState`` — streaming/queries.py (T8)
- grouped-agg ``pandas_udf`` + Arrow Python UDTF — here (U1/U2)
- raw-RecordBatch ``mapInArrow`` — here (U3, Arrow compute kernels
  with no pandas conversion at all).

Both operators below are Arrow-batched end to end: the UDAF plans as
``ArrowAggregatePython`` (vectorized partial-less aggregation after a
single hash shuffle on the group key) and the UDTF as
``ArrowEvalPythonUDTF`` (narrow, no shuffle, batches stream through
the generator). Neither ever materializes per-row Python objects the
way a row-at-a-time UDF (``BatchEvalPython``) would, so at 100 TB the
Python cost is one Arrow round trip per ~10k-row batch, not per row.

Closure rule: the UDF/UDTF bodies are defined INSIDE the query
functions so cloudpickle serializes them by value — module-level
defs pickle by reference and break when executors can't import this
package (driver running from a foreign cwd).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..functions.numeric import round2
from ..sources.tables import load_table


def median_value_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — grouped-agg pandas UDAF: exact median of ``value`` per
    event_type (a true holistic aggregate, not expressible as a
    partial-aggregable built-in; ``percentile_approx`` is the sketch
    cousin registered under sketch_value_quantiles).

    One shuffle on event_type, then Arrow batches per group into
    ``Series.median`` (linear-interpolated midpoint — same as
    DuckDB's ``median`` over doubles).
    """

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    # Spark disallows mixing pandas and JVM aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a pandas
    # aggregate too — same shuffle, same Arrow batch.
    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return len(v)

    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            round2(median_udaf(F.col("value"))).alias("med_value"),
            count_udaf(F.col("value")).alias("n"),
        )
    )


def arrow_byte_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — ``mapInArrow``: the third (and lowest-level) sanctioned
    vectorized surface, completing the UDF family alongside the U1
    grouped-agg pandas UDAF and U2 Arrow UDTF. Batches arrive as raw
    ``pyarrow.RecordBatch`` and are transformed entirely with Arrow
    COMPUTE KERNELS (C++ SIMD, no pandas conversion, no Python loop):
    per-document codepoint count, UTF-8 byte count, and an
    'e'-occurrence count — the char-vs-byte profile a tokenizer-budget
    audit needs on multilingual text, where len(chars) != len(bytes).

    Plans as ``MapInArrow`` (narrow, no shuffle); the tiny per-lang
    rollup after it is JVM-side. DuckDB replays with
    length/octet_length/replace arithmetic — hash-exact, so the Arrow
    kernel semantics themselves (codepoints vs bytes) are pinned.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    def profile(batches):
        # imports + defs inside the closure: pickled by value (module
        # refs would break on foreign-cwd executors)
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            t = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    b.column("lang"),
                    pc.cast(pc.utf8_length(t), pa.int64()),
                    pc.cast(pc.binary_length(pc.cast(t, pa.binary())), pa.int64()),
                    pc.cast(pc.count_substring(t, "e"), pa.int64()),
                ],
                names=["doc_id", "lang", "n_chars", "n_bytes", "n_e"],
            )

    prof = docs.mapInArrow(
        profile, "doc_id bigint, lang string, n_chars bigint, n_bytes bigint, n_e bigint"
    )
    return prof.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum("n_e").cast("bigint").alias("total_e"),
    )


def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — Arrow Python UDTF in a LATERAL join: tokenize
    ``documents.text`` (one output row per token) and histogram the
    token lengths.

    The UDTF is the sanctioned table-function surface for one→many
    Python transforms (the explode-shaped cousin of mapInPandas).
    Plans as ArrowEvalPythonUDTF — narrow, batch-streamed, no
    shuffle until the final tiny groupBy on token length.
    """

    @udtf(returnType="token string", useArrow=True)
    class Tokenize:
        def eval(self, text: str):
            for tok in (text or "").split(" "):
                if tok:
                    yield (tok,)

    spark.udtf.register("u2_tokenize", Tokenize)
    docs = load_table(spark, sf_dir, "documents")
    toks = spark.sql(
        "SELECT t.token FROM {d} AS d, LATERAL u2_tokenize(d.text) AS t",
        d=docs,
    )
    return (
        toks.groupBy(F.length("token").cast("bigint").alias("tok_len"))
        .agg(F.count("*").alias("n"))
    )
