"""Content-defined chunking (l2_cdc_chunk_dedup) properties.

The oracle query pins the aggregate stats against DuckDB; these tests
pin the CHUNKING itself: exact reassembly, agreement with an
independent pure-Python reference chunker, and the defining CDC
property — boundaries re-localize after an insertion, unlike a
fixed-stride chunker.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_analytics_spark.operators.text import (
    CDC_DIVISOR,
    CDC_MOD,
    CDC_POWS,
    CDC_WINDOW,
    cdc_chunks,
)


def ref_chunks(text: str) -> list[str]:
    """Independent reference: O(n·W) direct evaluation of the same
    boundary rule (cut after any window whose polynomial hash ≡ 0
    mod 64; final position always cuts)."""
    n = len(text)
    ends = []
    for i in range(1, n - CDC_WINDOW + 2):  # 1-based window starts
        h = sum(
            ord(text[i - 1 + j]) * CDC_POWS[j] for j in range(CDC_WINDOW)
        )
        if h % CDC_MOD % CDC_DIVISOR == 0:
            ends.append(i + CDC_WINDOW - 1)
    if not ends or ends[-1] != n:
        ends.append(n)
    out, prev = [], 0
    for e in ends:
        out.append(text[prev:e])
        prev = e
    return out


def test_chunks_reassemble_exactly(spark, sf_dir):
    got = (
        cdc_chunks(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk")))
                .getField("chunk")
            ).alias("rebuilt")
        )
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    joined = docs.join(got, "doc_id")
    assert joined.count() == docs.count()
    assert joined.filter(F.col("rebuilt") != F.col("text")).count() == 0


def test_chunks_match_reference_implementation(spark, sf_dir):
    rows = (
        cdc_chunks(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk")))
            .getField("chunk")
            .alias("chunks")
        )
        .join(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            ),
            "doc_id",
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert list(r.chunks) == ref_chunks(r.text), r.doc_id


def test_insertion_relocalizes_boundaries():
    """The reason CDC exists: after inserting a prefix, all chunks
    beyond the first post-insertion boundary are IDENTICAL to the
    original's — a fixed-stride chunker would shift every one."""
    base = "the quick brown fox jumps over the lazy dog. " * 40
    edited = "INSERTED-PREAMBLE-XYZ " + base
    a, b = ref_chunks(base), ref_chunks(edited)
    # find the shared chunk suffix
    k = 0
    while k < min(len(a), len(b)) and a[len(a) - 1 - k] == b[len(b) - 1 - k]:
        k += 1
    assert k >= max(1, len(a) - 2), (len(a), len(b), k)
    # sanity: the chunking is non-trivial (more than one chunk)
    assert len(a) > 1