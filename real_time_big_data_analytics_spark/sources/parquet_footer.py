"""Parquet footer reader — pure stdlib, from the public Apache
Parquet format specification (parquet-format: Thrift compact protocol
+ parquet.thrift FileMetaData).

Why it exists: at 100 TB the footer IS the query planner's input —
row-group sizes decide split counts, column statistics decide
row-group pruning, encodings/codecs decide scan cost. An engine
should be able to AUDIT that physical layout (are stats present? are
row groups sized for the cluster? is anything uncompressed?) without
decompressing a single data page. This module walks the footer bytes
directly; ``dq_parquet_footer_stats`` (queries_text.py) then binds the
decoded statistics to the DATA itself — the oracle recomputes
min/max/count from the rows, so a misparsed varint or a wrong stats
offset breaks the hash. tests/test_parquet_footer.py additionally
cross-checks the full walk against TWO foreign readers of the same
bytes: DuckDB's ``parquet_metadata()`` and pyarrow's metadata object.

Implemented subset (everything FileMetaData needs):
- Thrift compact protocol: field headers with id deltas, zigzag
  varints (i16/i32/i64), binary/string, bool-in-nibble, list/set
  headers, nested structs, map headers (skipped generically), double;
- footer framing: trailing ``PAR1`` magic + 4-byte LE footer length;
- FileMetaData → schema elements, row groups → column chunks →
  ColumnMetaData (type, encodings, path, codec, value counts, sizes,
  page offsets, Statistics incl. typed min/max decoding).

No data pages are read, so codecs never matter here (SNAPPY/ZSTD
chunks audit the same as uncompressed ones).
"""

from __future__ import annotations

import io
import struct

MAGIC = b"PAR1"

# thrift compact type nibbles
_STOP, _TRUE, _FALSE, _BYTE, _I16, _I32, _I64, _DOUBLE, _BINARY = range(9)
_LIST, _SET, _MAP, _STRUCT = 9, 10, 11, 12

PHYSICAL_TYPES = (
    "BOOLEAN",
    "INT32",
    "INT64",
    "INT96",
    "FLOAT",
    "DOUBLE",
    "BYTE_ARRAY",
    "FIXED_LEN_BYTE_ARRAY",
)
CODECS = (
    "UNCOMPRESSED",
    "SNAPPY",
    "GZIP",
    "LZO",
    "BROTLI",
    "LZ4",
    "ZSTD",
    "LZ4_RAW",
)
ENCODINGS = {
    0: "PLAIN",
    2: "PLAIN_DICTIONARY",
    3: "RLE",
    4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED",
    6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY",
    8: "RLE_DICTIONARY",
    9: "BYTE_STREAM_SPLIT",
}


def _read_uvarint(buf: io.BytesIO) -> int:
    shift = u = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("varint truncated")
        b = raw[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _zigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _read_value(buf: io.BytesIO, ftype: int):
    if ftype in (_TRUE, _FALSE):
        return ftype == _TRUE
    if ftype == _BYTE:
        return struct.unpack("b", buf.read(1))[0]
    if ftype in (_I16, _I32, _I64):
        return _zigzag(_read_uvarint(buf))
    if ftype == _DOUBLE:
        return struct.unpack("<d", buf.read(8))[0]
    if ftype == _BINARY:
        n = _read_uvarint(buf)
        return buf.read(n)
    if ftype in (_LIST, _SET):
        head = buf.read(1)[0]
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size = _read_uvarint(buf)
        if etype in (_TRUE, _FALSE):  # bools in lists are one byte each
            return [buf.read(1)[0] == 1 for _ in range(size)]
        return [_read_value(buf, etype) for _ in range(size)]
    if ftype == _MAP:
        size = _read_uvarint(buf)
        if size == 0:
            return {}
        kv = buf.read(1)[0]
        ktype, vtype = kv >> 4, kv & 0x0F

        def _elem(etype):
            # bools inside maps are one byte per element, exactly like
            # the list/set path above — the zero-byte header-nibble
            # encoding applies only to struct FIELDS; treating map
            # elements that way desyncs the stream for any map<_,bool>
            if etype in (_TRUE, _FALSE):
                return buf.read(1)[0] == 1
            return _read_value(buf, etype)

        out = {}
        for _ in range(size):
            k = _elem(ktype)
            out[k] = _elem(vtype)
        return out
    if ftype == _STRUCT:
        return _read_struct(buf)
    raise ValueError(f"unknown thrift compact type {ftype}")


def _read_struct(buf: io.BytesIO) -> dict[int, object]:
    """Generic compact-protocol struct → {field_id: value}."""
    out: dict[int, object] = {}
    fid = 0
    while True:
        head = buf.read(1)
        if not head:
            raise EOFError("struct truncated")
        if head[0] == _STOP:
            return out
        delta = head[0] >> 4
        ftype = head[0] & 0x0F
        fid = fid + delta if delta else _zigzag(_read_uvarint(buf))
        out[fid] = _read_value(buf, ftype)


def _decode_stat(raw: bytes | None, physical: str):
    """Typed decode of a Statistics min_value/max_value payload
    (plain encoding per the spec)."""
    if raw is None:
        return None
    if physical == "INT32":
        return struct.unpack("<i", raw)[0]
    if physical == "INT64":
        return struct.unpack("<q", raw)[0]
    if physical == "FLOAT":
        return struct.unpack("<f", raw)[0]
    if physical == "DOUBLE":
        return struct.unpack("<d", raw)[0]
    if physical == "BOOLEAN":
        return raw[0] != 0
    if physical == "BYTE_ARRAY":
        return raw.decode("utf-8", errors="replace")
    return raw  # INT96 / fixed-len: opaque


def read_footer(path: str) -> dict:
    """Parse one parquet file's FileMetaData. Returns::

        {version, num_rows, created_by, schema: [{name, type}...],
         row_groups: [{num_rows, total_byte_size,
                       columns: [{path, type, codec, encodings,
                                  num_values, total_compressed_size,
                                  total_uncompressed_size,
                                  data_page_offset,
                                  dictionary_page_offset,
                                  null_count, min, max}, ...]}, ...]}
    """
    with open(path, "rb") as f:
        f.seek(0, 2)
        size = f.tell()
        if size < 12:
            raise ValueError(f"{path}: too small for a parquet file")
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] != MAGIC:
            raise ValueError(f"{path}: missing PAR1 trailer")
        (meta_len,) = struct.unpack("<I", tail[:4])
        if meta_len > size - 8:
            raise ValueError(f"{path}: footer length {meta_len} exceeds file")
        f.seek(size - 8 - meta_len)
        raw = f.read(meta_len)
    fm = _read_struct(io.BytesIO(raw))
    try:
        return _interpret(fm)
    except (AttributeError, TypeError, KeyError, IndexError) as e:
        # a corrupt field-type nibble morphs a struct into an int (or a
        # list into a bool) and the shape-mapping below trips — surface
        # it as the designed rejection, not an accidental crash
        # (failure class pinned by tests/test_binary_reader_fuzz.py)
        raise ValueError(
            f"{path}: malformed FileMetaData ({type(e).__name__}: {e})"
        ) from e


def _interpret(fm: dict) -> dict:
    schema = [
        {
            "name": (se.get(4) or b"").decode(),
            "type": PHYSICAL_TYPES[se[1]] if 1 in se else None,
        }
        for se in fm.get(2, [])
    ]
    row_groups = []
    for rg in fm.get(4, []):
        cols = []
        for cc in rg.get(1, []):
            md = cc.get(3, {})
            physical = PHYSICAL_TYPES[md[1]]
            stats = md.get(12, {})
            # min_value/max_value (5/6) with legacy max/min (1/2) fallback
            raw_max = stats.get(5, stats.get(1))
            raw_min = stats.get(6, stats.get(2))
            cols.append(
                {
                    "path": ".".join(p.decode() for p in md.get(3, [])),
                    "type": physical,
                    "codec": CODECS[md[4]],
                    "encodings": sorted(
                        ENCODINGS.get(e, str(e)) for e in md.get(2, [])
                    ),
                    "num_values": md[5],
                    "total_uncompressed_size": md[6],
                    "total_compressed_size": md[7],
                    "data_page_offset": md.get(9),
                    "dictionary_page_offset": md.get(11),
                    "null_count": stats.get(3),
                    "min": _decode_stat(raw_min, physical),
                    "max": _decode_stat(raw_max, physical),
                }
            )
        row_groups.append(
            {
                "num_rows": rg.get(3),
                "total_byte_size": rg.get(2),
                "columns": cols,
            }
        )
    return {
        "version": fm.get(1),
        "num_rows": fm.get(3),
        "created_by": (fm.get(6) or b"").decode(errors="replace"),
        "schema": schema,
        "row_groups": row_groups,
    }


# Columns whose serialized values grow with the corpus (document text,
# JSON props): parquet writers OMIT or TRUNCATE chunk min/max once a
# value exceeds their stats size cap (parquet-mr ~4 KB), so the footer's
# string bounds for these stop being a recomputable function of the data
# at some scale factor. The audit therefore claims only num_values and
# the null count for them (always present in ColumnMetaData/Statistics
# regardless of the min/max cap) and reports an explicit stats_present
# flag instead of value bounds — a writer-side omission flips the flag
# detectably rather than silently diverging from the data-side oracle.
UNBOUNDED_WIDTH_COLS = frozenset({"documents.text", "events.props"})


def footer_column_stats(spark, sf_dir: str, tables=("events", "documents")):
    """``dq_parquet_footer_stats`` — per-column statistics read from
    the FOOTER BYTES ALONE (no data pages touched), aggregated across
    row groups and part files, typed per physical type. The oracle
    recomputes the same numbers from the rows, so the audit passes
    only if the footer's claims about the data are both correctly
    parsed and actually true — exactly what row-group pruning relies
    on at scale.

    Every row carries ``stats_present`` = "every chunk of this column
    published min AND max bounds"; for bounded-width columns the oracle
    asserts it TRUE, so a writer omitting stats breaks the hash on this
    explicit flag (with bounds already NULL on both sides for the
    unbounded-width columns — see ``UNBOUNDED_WIDTH_COLS``).

    Scale: one Spark task per parquet file (mapInPandas over the file
    list) — a 100 TB table with thousands of part files audits as a
    thousands-way parallel metadata scan, reading ~64 KiB per file.
    """
    import os

    import pandas as pd  # noqa: F401  (mapInPandas contract)
    from pyspark.sql import functions as F

    pkg = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    paths = []
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # a directory of part files
            paths += [
                (t, os.path.join(p, f))
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            ]
        else:
            paths.append((t, p))
    files = spark.createDataFrame(paths, "tbl string, path string").repartition(
        max(len(paths), 1)
    )

    def parse(iterator):
        import sys

        if pkg not in sys.path:
            sys.path.insert(0, pkg)
        import pandas as pd

        from real_time_big_data_analytics_spark.sources.parquet_footer import (
            read_footer,
        )

        cols = [
            "col_name",
            "num_values",
            "n_nulls",
            "chunk_has_bounds",
            "min_int",
            "max_int",
            "min_dbl",
            "max_dbl",
            "min_str",
            "max_str",
        ]
        for pdf in iterator:
            rows = []
            for tbl, path in zip(pdf["tbl"], pdf["path"]):
                fm = read_footer(path)
                for rg in fm["row_groups"]:
                    for c in rg["columns"]:
                        name = f"{tbl}.{c['path']}"
                        has_bounds = (
                            c["min"] is not None and c["max"] is not None
                        )
                        r = {
                            "col_name": name,
                            "num_values": c["num_values"],
                            "n_nulls": c["null_count"],
                            "chunk_has_bounds": has_bounds,
                            "min_int": None,
                            "max_int": None,
                            "min_dbl": None,
                            "max_dbl": None,
                            "min_str": None,
                            "max_str": None,
                        }
                        if name in UNBOUNDED_WIDTH_COLS:
                            pass  # bounds not claimed (cap-dependent)
                        elif c["type"] in ("INT32", "INT64"):
                            r["min_int"], r["max_int"] = c["min"], c["max"]
                        elif c["type"] in ("FLOAT", "DOUBLE"):
                            r["min_dbl"], r["max_dbl"] = c["min"], c["max"]
                        elif c["type"] == "BYTE_ARRAY":
                            r["min_str"], r["max_str"] = c["min"], c["max"]
                        rows.append(r)
            yield pd.DataFrame(rows, columns=cols)

    schema = (
        "col_name string, num_values bigint, n_nulls bigint, "
        "chunk_has_bounds boolean, "
        "min_int bigint, max_int bigint, min_dbl double, max_dbl double, "
        "min_str string, max_str string"
    )
    chunks = files.mapInPandas(parse, schema=schema)
    return (
        chunks.groupBy("col_name")
        .agg(
            F.sum("num_values").cast("bigint").alias("num_values"),
            F.sum("n_nulls").cast("bigint").alias("n_nulls"),
            # NULL (unknowable claim) for unbounded-width columns, else
            # "every chunk published both bounds" — the oracle pins TRUE
            F.when(
                F.col("col_name").isin(*sorted(UNBOUNDED_WIDTH_COLS)),
                F.lit(None).cast("boolean"),
            )
            .otherwise(F.every("chunk_has_bounds"))
            .alias("stats_present"),
            F.min("min_int").alias("min_int"),
            F.max("max_int").alias("max_int"),
            # + 0.0 canonicalizes IEEE signed zero: the spec tells
            # writers to store -0.0 as a double column's min bound,
            # while the data-side oracle computes +0.0 (seen live at
            # sf0.1); the two compare equal but hash differently
            (F.min("min_dbl") + F.lit(0.0)).alias("min_dbl"),
            (F.max("max_dbl") + F.lit(0.0)).alias("max_dbl"),
            F.min("min_str").alias("min_str"),
            F.max("max_str").alias("max_str"),
        )
        .orderBy("col_name")
    )


def _stat_select(tbl: str, col: str, kind: str) -> str:
    """One UNION ALL branch of the footer-stats oracle: recompute a
    column's footer claims from the data. kind: int | dbl | str | ts
    (ts = INT64 epoch-micros physical) | wide (unbounded-width string —
    bounds and presence flag NOT claimed; num_values and null_count
    stay checked, the latter not being subject to the writers' min/max
    serialization cap)."""
    n = f"count(*) AS num_values, CAST(count(*) - count({col}) AS BIGINT) AS n_nulls"
    # bounded-width columns assert the footer published bounds
    sp = (
        "CAST(NULL AS BOOLEAN) AS stats_present"
        if kind == "wide"
        else "CAST(1 AS BOOLEAN) AS stats_present"
    )
    nulls = {
        "int": "min({c}) AS min_int, max({c}) AS max_int, CAST(NULL AS DOUBLE) AS min_dbl, CAST(NULL AS DOUBLE) AS max_dbl, CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str",
        "ts": "epoch_us(min({c})) AS min_int, epoch_us(max({c})) AS max_int, CAST(NULL AS DOUBLE) AS min_dbl, CAST(NULL AS DOUBLE) AS max_dbl, CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str",
        "dbl": "CAST(NULL AS BIGINT) AS min_int, CAST(NULL AS BIGINT) AS max_int, min({c}) + 0.0 AS min_dbl, max({c}) + 0.0 AS max_dbl, CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str",
        "str": "CAST(NULL AS BIGINT) AS min_int, CAST(NULL AS BIGINT) AS max_int, CAST(NULL AS DOUBLE) AS min_dbl, CAST(NULL AS DOUBLE) AS max_dbl, min({c}) AS min_str, max({c}) AS max_str",
        "wide": "CAST(NULL AS BIGINT) AS min_int, CAST(NULL AS BIGINT) AS max_int, CAST(NULL AS DOUBLE) AS min_dbl, CAST(NULL AS DOUBLE) AS max_dbl, CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str",
    }[kind].format(c=col)
    return f"SELECT '{tbl}.{col}' AS col_name, {n}, {sp}, {nulls} FROM {tbl}"


FOOTER_STATS_SQL = (
    "\nUNION ALL\n".join(
        [
            _stat_select("events", "event_id", "int"),
            _stat_select("events", "ts", "ts"),
            _stat_select("events", "user_id", "int"),
            _stat_select("events", "event_type", "str"),
            _stat_select("events", "value", "dbl"),
            _stat_select("events", "props", "wide"),
            _stat_select("documents", "doc_id", "int"),
            _stat_select("documents", "text", "wide"),
            _stat_select("documents", "lang", "str"),
            _stat_select("documents", "source", "str"),
            _stat_select("documents", "n_chars", "int"),
        ]
    )
    + "\nORDER BY col_name"
)
