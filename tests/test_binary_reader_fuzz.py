"""Adversarial-bytes properties for the two round-7 binary readers.

A reader that faces bytes from outside the engine (Avro containers
from any writer, parquet footers from any tool) must never hang,
never loop, and never return silently-wrong data on corrupt input:
every mutation either still decodes to a VALID prefix-consistent
result (e.g. a flipped bit inside an unread padding region) or raises
a clean exception. Infinite-loop and memory-bomb classes (negative
lengths, truncated varints, absurd list sizes) are pinned explicitly.
"""

from __future__ import annotations

import io

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_big_data_analytics_spark.sources import avro_ocf as A
from real_time_big_data_analytics_spark.sources import parquet_footer as PF

SCHEMA = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "p", "type": ["null", "string"]},
    ],
}
ROWS = [
    {"a": i - 5, "s": f"s{i}" * (i % 3), "p": None if i % 2 else f"p{i}"}
    for i in range(40)
]


import struct  # noqa: E402


def _clean_failure(exc: BaseException) -> bool:
    """The DESIGNED rejection classes only. AttributeError/TypeError
    are deliberately absent: a corrupt type nibble used to crash the
    footer's shape-mapping with exactly those — read_footer now folds
    them into ValueError('malformed FileMetaData'), and a 5000-trial
    bit-flip fuzz passes under this strict set."""
    return isinstance(
        exc,
        (ValueError, EOFError, NotImplementedError, UnicodeDecodeError,
         OverflowError, MemoryError, struct.error),
    )


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_avro_reader_survives_byte_flips(tmp_path_factory, data):
    path = str(tmp_path_factory.mktemp("fz") / "f.avro")
    A.write_ocf(path, SCHEMA, ROWS, codec="null", block_rows=16)
    raw = bytearray(open(path, "rb").read())
    pos = data.draw(st.integers(min_value=0, max_value=len(raw) - 1))
    bit = data.draw(st.integers(min_value=0, max_value=7))
    raw[pos] ^= 1 << bit
    open(path, "wb").write(bytes(raw))
    try:
        out = list(A.read_ocf(path))
    except Exception as e:  # noqa: BLE001 — the property IS the class
        assert _clean_failure(e), type(e)
    else:
        # decoded without error: every row must share ONE key set (a
        # flip inside the schema JSON may legitimately RENAME a field —
        # the reader then faithfully decodes the renamed file — but
        # half-read garbage mixing record shapes is never acceptable)
        shapes = {frozenset(r) for r in out}
        assert len(shapes) <= 1, shapes


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_avro_reader_survives_truncation(tmp_path_factory, data):
    path = str(tmp_path_factory.mktemp("fz") / "t.avro")
    A.write_ocf(path, SCHEMA, ROWS, codec="deflate", block_rows=16)
    raw = open(path, "rb").read()
    cut = data.draw(st.integers(min_value=0, max_value=len(raw) - 1))
    open(path, "wb").write(raw[:cut])
    try:
        list(A.read_ocf(path))
    except Exception as e:  # noqa: BLE001
        assert _clean_failure(e), type(e)


def test_avro_varint_bomb_rejected():
    """An unterminated varint (all continuation bits) must raise, not
    spin: the 10-byte bound check."""
    with pytest.raises((ValueError, EOFError)):
        A.read_long(io.BytesIO(b"\xff" * 64))


def test_avro_negative_length_rejected():
    buf = io.BytesIO()
    A.write_long(buf, -5)  # a negative byte-length on the wire
    with pytest.raises(ValueError, match="negative"):
        A.read_bytes(io.BytesIO(buf.getvalue()))


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_parquet_footer_survives_byte_flips(data):
    src = open("/root/testdata/sf0.01/region.parquet", "rb").read()
    raw = bytearray(src)
    # mutate within the footer region (metadata + framing), where the
    # parser actually reads
    (meta_len,) = __import__("struct").unpack("<I", src[-8:-4])
    lo = len(src) - 8 - meta_len
    pos = data.draw(st.integers(min_value=lo, max_value=len(raw) - 1))
    bit = data.draw(st.integers(min_value=0, max_value=7))
    raw[pos] ^= 1 << bit
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
        f.write(bytes(raw))
        f.flush()
        try:
            fm = PF.read_footer(f.name)
        except Exception as e:  # noqa: BLE001
            assert _clean_failure(e), type(e)
        else:
            # parsed without error: structural invariants still hold
            assert isinstance(fm["row_groups"], list)
            for rg in fm["row_groups"]:
                assert isinstance(rg["columns"], list)


def test_parquet_footer_length_bomb_rejected():
    """A footer length claiming more bytes than the file has must be
    rejected up front (no giant allocation, no negative seek)."""
    import struct as s
    import tempfile

    body = b"PAR1" + b"x" * 64 + s.pack("<I", 2**31 - 1) + b"PAR1"
    with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
        f.write(body)
        f.flush()
        with pytest.raises(ValueError, match="exceeds"):
            PF.read_footer(f.name)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_page_index_reader_survives_byte_flips(tmp_path_factory, data):
    """Round 11: the page-index walk (footer fields 4-7 + seeked
    ColumnIndex/OffsetIndex structs) under single-bit corruption —
    decode correctly, or raise from the designed class; never hang,
    never return shapes that crash the caller."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from real_time_big_data_analytics_spark.sources.parquet_footer import (
        read_page_index,
    )

    path = str(tmp_path_factory.mktemp("pz") / "p.parquet")
    papq.write_table(
        pa.table({"a": list(range(2000))}),
        path,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=500,
    )
    raw = bytearray(open(path, "rb").read())
    pos = data.draw(st.integers(min_value=0, max_value=len(raw) - 1))
    bit = data.draw(st.integers(min_value=0, max_value=7))
    raw[pos] ^= 1 << bit
    open(path, "wb").write(bytes(raw))
    try:
        out = read_page_index(path)
        for rg in out:
            for e in rg:
                if e["column_index"] is not None:
                    assert isinstance(e["column_index"]["min_values"], list)
    except BaseException as e:
        assert _clean_failure(e), f"undesigned failure: {type(e).__name__}: {e}"


_BLOOM_FUZZ_BYTES: list[bytes] = []


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_bloom_filter_reader_survives_byte_flips(spark, tmp_path_factory, data):
    """Round 11: the bloom header + bitset walk under single-bit
    corruption — decode, or raise from the designed class. A corrupt
    BITSET that still parses is acceptable (blooms are probabilistic),
    but the probe path must never crash on it. The clean file is
    written ONCE by parquet-mr (this pyarrow lacks
    bloom_filter_columns) and mutated per example."""
    from real_time_big_data_analytics_spark.sources.parquet_footer import (
        bloom_might_contain,
        read_bloom_filters,
    )

    if not _BLOOM_FUZZ_BYTES:
        import glob
        import os

        from pyspark.sql import functions as F

        d = str(tmp_path_factory.mktemp("bz") / "clean")
        (
            spark.range(0, 500)
            .select(F.col("id").alias("a"))
            .coalesce(1)
            .write.option("parquet.bloom.filter.enabled#a", "true")
            .option("parquet.bloom.filter.expected.ndv#a", "500")
            .option("parquet.enable.dictionary#a", "false")
            .parquet(d)
        )
        src = glob.glob(os.path.join(d, "*.parquet"))[0]
        _BLOOM_FUZZ_BYTES.append(open(src, "rb").read())
    path = str(tmp_path_factory.mktemp("bz") / "b.parquet")
    raw = bytearray(_BLOOM_FUZZ_BYTES[0])
    pos = data.draw(st.integers(min_value=0, max_value=len(raw) - 1))
    bit = data.draw(st.integers(min_value=0, max_value=7))
    raw[pos] ^= 1 << bit
    open(path, "wb").write(bytes(raw))
    try:
        for rg in read_bloom_filters(path):
            for b in rg.values():
                bloom_might_contain(b, 3)
    except BaseException as e:
        assert _clean_failure(e), f"undesigned failure: {type(e).__name__}: {e}"
