"""Avro Object Container File codec + in-engine DataSource path.

Validation layers (mirroring the GIF/Kafka-wire evidence model):
1. the Avro spec's own zigzag byte vectors;
2. python write→read roundtrips over both codecs and all field kinds;
3. FOREIGN interop both directions with the official Apache Avro JAVA
   implementation (avro-1.12.1.jar ships inside pyspark's JVM):
   Java reads our files, we read Java's;
4. corruption detection (sync-marker flip, truncation);
5. the environment probe: Spark's own ``format("avro")`` is the
   external spark-avro module, absent from the bundled jars — the
   same gap class as the kafka connector, re-proven here per round;
6. the in-engine path: write through ``format("avro_ocf")`` (Spark
   tasks, task-commit rename), read back, exact row equality.
"""

from __future__ import annotations

import io
import json
import os

import pytest

from real_time_big_data_analytics_spark.sources import avro_ocf as A

EV_SCHEMA = {
    "type": "record",
    "name": "Ev",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "ts_us", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
        {"name": "props", "type": ["null", "string"]},
    ],
}


def _rows(n: int) -> list[dict]:
    return [
        {
            "event_id": i - n // 2,  # negatives exercise zigzag
            "ts_us": 1_700_000_000_000_000 + 7 * i,
            "event_type": ["view", "click", "päge☃"][i % 3],  # unicode
            "value": (i * 0.517) - 3.25,
            "props": None if i % 4 == 0 else f"p{i}" * (i % 5),
        }
        for i in range(n)
    ]


def test_zigzag_spec_vectors():
    # table straight from the Avro spec's "binary encoding" section
    for n, expect in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                      (2, b"\x04"), (-2, b"\x03"), (-64, b"\x7f"),
                      (64, b"\x80\x01"), (8192, b"\x80\x80\x01")]:
        buf = io.BytesIO()
        A.write_long(buf, n)
        assert buf.getvalue() == expect, n
        assert A.read_long(io.BytesIO(expect)) == n


def test_long_roundtrip_extremes():
    for n in (2**63 - 1, -(2**63), 2**31, -(2**31) - 1, 10**17):
        buf = io.BytesIO()
        A.write_long(buf, n)
        assert A.read_long(io.BytesIO(buf.getvalue())) == n


@pytest.mark.parametrize(
    "codec", ["null", "deflate", "snappy", "bzip2", "xz", "zstandard"]
)
def test_python_roundtrip(tmp_path, codec):
    rows = _rows(5000)
    path = str(tmp_path / f"ev_{codec}.avro")
    n = A.write_ocf(path, EV_SCHEMA, rows, codec=codec, block_rows=700)
    assert n == 5000
    assert list(A.read_ocf(path)) == rows


@pytest.mark.parametrize(
    "codec", ["null", "deflate", "snappy", "bzip2", "xz", "zstandard"]
)
def test_java_reads_our_file(spark, tmp_path, codec):
    """FOREIGN decode: the official Apache Avro Java reader (inside
    pyspark's JVM) must read every record we wrote, byte-compatible."""
    rows = _rows(300)
    path = str(tmp_path / f"jv_{codec}.avro")
    A.write_ocf(path, EV_SCHEMA, rows, codec=codec, block_rows=64)
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    assert json.loads(str(reader.getSchema())) == EV_SCHEMA
    got = []
    while reader.hasNext():
        rec = reader.next()
        got.append(
            {
                "event_id": rec.get("event_id"),
                "ts_us": rec.get("ts_us"),
                "event_type": str(rec.get("event_type")),
                "value": rec.get("value"),
                "props": None if rec.get("props") is None else str(rec.get("props")),
            }
        )
    reader.close()
    assert got == rows


@pytest.mark.parametrize(
    "jcodec", ["deflate", "snappy", "bzip2", "xz", "zstandard"]
)
def test_we_read_java_file(spark, tmp_path, jcodec):
    """Reverse interop: a file written by the official Java
    DataFileWriter (its RANDOM sync marker; snappy via the bundled
    snappy-java native codec — true foreign snappy bytes) decodes
    exactly with read_ocf."""
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(EV_SCHEMA))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    cf = jvm.org.apache.avro.file.CodecFactory
    writer.setCodec(
        {
            "deflate": lambda: cf.deflateCodec(6),
            "snappy": cf.snappyCodec,
            "bzip2": cf.bzip2Codec,
            "xz": lambda: cf.xzCodec(6),
            "zstandard": lambda: cf.zstandardCodec(3),
        }[jcodec]()
    )
    path = str(tmp_path / f"java_written_{jcodec}.avro")
    writer.create(schema, jvm.java.io.File(path))
    rows = _rows(123)
    for r in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        for k, v in r.items():
            rec.put(k, v)
        writer.append(rec)
    writer.close()
    assert list(A.read_ocf(path)) == rows


def test_corrupt_sync_marker_raises(tmp_path):
    path = str(tmp_path / "c.avro")
    A.write_ocf(path, EV_SCHEMA, _rows(100), codec="null", block_rows=40)
    raw = bytearray(open(path, "rb").read())
    raw[-1] ^= 0xFF  # last byte of the final block's sync marker
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync marker"):
        list(A.read_ocf(path))


def test_truncated_block_raises(tmp_path):
    path = str(tmp_path / "t.avro")
    A.write_ocf(path, EV_SCHEMA, _rows(100), codec="deflate", block_rows=100)
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[: len(raw) - 20])
    with pytest.raises((EOFError, ValueError)):
        list(A.read_ocf(path))


def test_format_avro_absent_probe(spark, tmp_path):
    """The environment gap this module fills, re-proven each round:
    pyspark bundles avro-1.12.1 (the library) but NOT the spark-avro
    datasource module, so format("avro") cannot plan."""
    import pyspark

    jars = os.listdir(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    assert any(j.startswith("avro-1.") for j in jars)
    assert not any("spark-avro" in j for j in jars)
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(Exception, match="[Aa]vro"):
        df.write.format("avro").save(str(tmp_path / "x"))


def test_in_engine_roundtrip_exact(spark, sf_dir):
    """events staged through Spark's write path (format("avro_ocf"),
    one container per task) and scanned back — exact multiset of rows
    vs the parquet source, not just aggregates."""
    from pyspark.sql import functions as F

    from real_time_big_data_analytics_spark.sources.pyds import (
        read_events_via_avro_ocf,
    )
    from real_time_big_data_analytics_spark.sources.tables import load_table

    back = read_events_via_avro_ocf(spark, sf_dir, codec="deflate")
    src = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_write_produces_part_files_and_success(spark, sf_dir):
    from real_time_big_data_analytics_spark.sources.pyds import (
        stage_events_as_avro,
    )

    out = stage_events_as_avro(spark, sf_dir, codec="deflate")
    files = sorted(os.listdir(out))
    parts = [f for f in files if f.startswith("part-") and f.endswith(".avro")]
    assert parts and "_SUCCESS" in files
    with open(os.path.join(out, "_SUCCESS")) as f:
        total = int(f.read())
    assert total == sum(1 for p in parts for _ in A.read_ocf(os.path.join(out, p)))


# ---------------------------------------- schema resolution (round 10)


def _rec(fields):
    return {"type": "record", "name": "R", "fields": fields}


def test_schema_resolution_rename_default_skip_promote(tmp_path):
    """One file, four evolution moves at once: a field renamed via
    reader ALIASES, a writer-only field skipped byte-exactly, a
    reader-only field filled from its default, and int->long /
    float->double promotions."""
    from real_time_big_data_analytics_spark.sources import avro_ocf as A

    writer = _rec([
        {"name": "id", "type": "long"},
        {"name": "old_name", "type": "string"},
        {"name": "dropme", "type": ["null", "string"]},
        {"name": "flag", "type": "int"},
        {"name": "score", "type": "float"},
    ])
    rows = [
        {"id": 1, "old_name": "a", "dropme": "x", "flag": 7, "score": 1.5},
        {"id": 2, "old_name": "b", "dropme": None, "flag": -3, "score": 2.5},
    ]
    p = str(tmp_path / "e.avro")
    A.write_ocf(p, writer, rows)
    reader = _rec([
        {"name": "id", "type": "long"},
        {"name": "new_name", "type": "string", "aliases": ["old_name"]},
        {"name": "flag", "type": "long"},          # int -> long
        {"name": "score", "type": "double"},       # float -> double
        {"name": "source", "type": "string", "default": "legacy"},
    ])
    got = list(A.read_ocf(p, reader_schema=reader))
    assert got == [
        {"id": 1, "new_name": "a", "flag": 7, "score": 1.5,
         "source": "legacy"},
        {"id": 2, "new_name": "b", "flag": -3, "score": 2.5,
         "source": "legacy"},
    ]
    assert all(isinstance(r["score"], float) for r in got)
    # without a reader schema the writer shape comes back untouched
    raw = list(A.read_ocf(p))
    assert raw[0]["old_name"] == "a" and raw[0]["dropme"] == "x"


def test_schema_resolution_union_and_string_bytes(tmp_path):
    """Union moves: writer non-union -> reader union (static branch
    pick), writer union -> reader union, and the string<->bytes
    promotion inside a union branch."""
    from real_time_big_data_analytics_spark.sources import avro_ocf as A

    writer = _rec([
        {"name": "a", "type": "string"},
        {"name": "b", "type": ["null", "string"]},
    ])
    p = str(tmp_path / "u.avro")
    A.write_ocf(p, writer, [{"a": "hi", "b": "there"}, {"a": "x", "b": None}])
    reader = _rec([
        {"name": "a", "type": ["null", "bytes"]},   # non-union -> union+promote
        {"name": "b", "type": ["null", "bytes"]},   # union -> union+promote
    ])
    got = list(A.read_ocf(p, reader_schema=reader))
    assert got == [{"a": b"hi", "b": b"there"}, {"a": b"x", "b": None}]


def test_schema_resolution_refusals(tmp_path):
    """No default for a missing field, and an impossible promotion,
    both fail LOUDLY (never silently null — the spec's error rule)."""
    import pytest

    from real_time_big_data_analytics_spark.sources import avro_ocf as A

    writer = _rec([{"name": "id", "type": "long"}])
    p = str(tmp_path / "r.avro")
    A.write_ocf(p, writer, [{"id": 1}])
    no_default = _rec([
        {"name": "id", "type": "long"},
        {"name": "extra", "type": "string"},  # absent + no default
    ])
    with pytest.raises(A.SchemaResolutionError, match="no default"):
        list(A.read_ocf(p, reader_schema=no_default))
    bad_promote = _rec([{"name": "id", "type": "string"}])  # long -/-> string
    with pytest.raises(A.SchemaResolutionError, match="does not resolve"):
        list(A.read_ocf(p, reader_schema=bad_promote))
