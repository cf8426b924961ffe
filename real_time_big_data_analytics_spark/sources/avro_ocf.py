"""Avro Object Container File codec — pure stdlib, from the public
Apache Avro 1.12 specification (container file + binary encoding).

Why it exists: the reference stack's Kafka pipelines conventionally
carry Avro payloads, and Spark's own ``format("avro")`` lives in the
EXTERNAL spark-avro module — absent from pyspark's bundled jars (same
environment gap as the kafka connector, probed in tools/probe_kafka.py
fashion by tests/test_avro_ocf.py). Rather than stub the format, this
module implements the container format itself and sources/pyds.py
routes it through Spark's engine via the Python Data Source API — the
same treatment the Kafka wire path got (VERDICT r6 ask #2).

Implemented subset (everything the events/documents tables need):

- container layout: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, then
  data blocks of ``(count, byte-size, payload, sync)``;
- codecs — the spec's COMPLETE required+optional set as of round 11:
  ``null``, ``deflate`` (raw DEFLATE, zlib windowBits=-15), ``snappy``
  (raw snappy block + BE CRC-32 of the plain bytes, pure-Python
  ``snappy_codec``), ``bzip2`` (stdlib ``bz2``), ``xz`` (stdlib
  ``lzma``, .xz container) and ``zstandard`` (zstd frame via
  pyarrow's C++ codec — baked-in dependency, loud refusal if absent);
- binary encoding: zigzag-varint longs/ints, IEEE-754 LE
  double/float, length-prefixed string/bytes, 1-byte boolean,
  zero-byte null, unions as ``(branch-index, value)``;
- schemas: records of the primitives above plus 2-branch
  ``["null", X]`` unions; logical types (timestamp-micros) ride on
  their underlying primitive per the spec.

The encoder is validated three ways in tests/test_avro_ocf.py: the
spec's own zigzag examples, python-roundtrip property tests over both
codecs, and a FOREIGN decode — the official Apache Avro *Java*
implementation (avro-1.12.1.jar ships inside pyspark's JVM) reads a
file this module wrote, via py4j.

Scale notes: a container file is block-splittable by design (readers
resync on the 16-byte marker), but this reader keeps the simpler
one-task-per-FILE planning — the writer produces one file per Spark
task (part files), so the read fan-out already equals the write
parallelism, exactly like native parquet part files.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from . import snappy_codec


def _zstd_compress(data: bytes) -> bytes:
    try:
        import pyarrow as pa
    except ImportError as e:  # pragma: no cover - pyarrow is baked in
        raise ValueError("zstandard codec needs pyarrow") from e
    return pa.compress(data, codec="zstd", asbytes=True)


def _zstd_decompress(data: bytes, path: str) -> bytes:
    """zstd frames self-describe their length — ``pa.input_stream``
    honors that, no decompressed-size oracle needed."""
    try:
        import pyarrow as pa
    except ImportError as e:  # pragma: no cover - pyarrow is baked in
        raise ValueError("zstandard codec needs pyarrow") from e
    try:
        return pa.input_stream(pa.py_buffer(data), compression="zstd").read()
    except (pa.ArrowInvalid, pa.ArrowIOError, OSError) as e:
        raise ValueError(f"{path}: corrupt zstandard block ({e})") from e


MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # fixed marker: deterministic output files


# -- primitive binary encoding ----------------------------------------


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    u = (n << 1) ^ (n >> 63)  # arithmetic shift keeps sign bits
    u &= (1 << 70) - 1  # bound the two's-complement image
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = u = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("varint truncated")
        b = raw[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return (u >> 1) ^ -(u & 1)
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    if n < 0:
        raise ValueError(f"negative byte-length {n}")
    b = buf.read(n)
    if len(b) != n:
        raise EOFError("bytes truncated")
    return b


# -- schema-driven record encoding ------------------------------------
#
# A "type" here is the parsed JSON schema node: a string primitive
# name, a dict record/logical node, or a list (union).


def _encode_value(buf: io.BytesIO, typ, v) -> None:
    if isinstance(typ, dict) and "logicalType" in typ:
        typ = typ["type"]
    if isinstance(typ, list):  # union: branch index then value
        if v is None and "null" in typ:
            write_long(buf, typ.index("null"))
            return
        branch = next(i for i, t in enumerate(typ) if t != "null")
        write_long(buf, branch)
        _encode_value(buf, typ[branch], v)
        return
    if isinstance(typ, dict) and typ.get("type") == "record":
        for f in typ["fields"]:
            _encode_value(buf, f["type"], v[f["name"]])
        return
    if typ in ("long", "int"):
        write_long(buf, v)
    elif typ == "string":
        write_bytes(buf, v.encode("utf-8"))
    elif typ == "bytes":
        write_bytes(buf, v)
    elif typ == "double":
        buf.write(struct.pack("<d", v))
    elif typ == "float":
        buf.write(struct.pack("<f", v))
    elif typ == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif typ == "null":
        pass
    else:
        raise NotImplementedError(f"avro type {typ!r}")


def _decode_value(buf: io.BytesIO, typ):
    if isinstance(typ, dict) and "logicalType" in typ:
        typ = typ["type"]
    if isinstance(typ, list):
        branch = read_long(buf)
        if not 0 <= branch < len(typ):
            raise ValueError(f"union branch {branch} out of range")
        return _decode_value(buf, typ[branch])
    if isinstance(typ, dict) and typ.get("type") == "record":
        return {f["name"]: _decode_value(buf, f["type"]) for f in typ["fields"]}
    if typ in ("long", "int"):
        return read_long(buf)
    if typ == "string":
        return read_bytes(buf).decode("utf-8")
    if typ == "bytes":
        return read_bytes(buf)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "boolean":
        raw = buf.read(1)
        if not raw:
            raise EOFError("boolean truncated")
        return raw[0] != 0
    if typ == "null":
        return None
    raise NotImplementedError(f"avro type {typ!r}")


# -- schema resolution (the spec's "Schema Resolution" section) ---------
#
# Round 10: a READER schema different from the file's WRITER schema —
# the feature that lets a 100 TB lake evolve (add a field with a
# default, rename via aliases, drop a field, widen a numeric type)
# without rewriting historical files. Fields match by name or reader
# ALIAS; writer-only fields are skipped byte-exactly; reader-only
# fields take their declared default (no default -> loud error);
# numeric/string-bytes promotions follow the spec's table; union
# branches resolve STATICALLY against the reader union (no
# backtracking reads).


class SchemaResolutionError(ValueError):
    pass


_PROMOTIONS = {
    ("int", "long"),
    ("int", "float"),
    ("int", "double"),
    ("long", "float"),
    ("long", "double"),
    ("float", "double"),
    ("string", "bytes"),
    ("bytes", "string"),
}


def _strip_logical(t):
    if isinstance(t, dict) and "logicalType" in t:
        return t["type"]
    return t


def _type_name(t) -> str:
    t = _strip_logical(t)
    if isinstance(t, dict):
        return t.get("type")
    if isinstance(t, list):
        return "union"
    return t


def _skip_value(buf: io.BytesIO, typ) -> None:
    """Consume one value of ``typ`` without materializing it — the
    writer-only-field path of resolution."""
    typ = _strip_logical(typ)
    if isinstance(typ, list):
        branch = read_long(buf)
        if not 0 <= branch < len(typ):
            raise ValueError(f"union branch {branch} out of range")
        _skip_value(buf, typ[branch])
    elif isinstance(typ, dict) and typ.get("type") == "record":
        for f in typ["fields"]:
            _skip_value(buf, f["type"])
    elif typ in ("long", "int"):
        read_long(buf)
    elif typ in ("string", "bytes"):
        read_bytes(buf)
    elif typ == "double":
        buf.read(8)
    elif typ == "float":
        buf.read(4)
    elif typ == "boolean":
        buf.read(1)
    elif typ == "null":
        pass
    else:
        raise NotImplementedError(f"avro type {typ!r}")


def _promote(v, w_name: str, r_name: str):
    if w_name == r_name:
        return v
    if (w_name, r_name) not in _PROMOTIONS:
        raise SchemaResolutionError(
            f"writer {w_name!r} does not resolve to reader {r_name!r}"
        )
    if r_name in ("float", "double"):
        return float(v)
    if r_name == "long":
        return int(v)
    if r_name == "bytes":
        return v.encode("utf-8") if isinstance(v, str) else v
    return v.decode("utf-8") if isinstance(v, bytes) else v


def _first_compatible(w, r_union: list):
    """The reader-union branch the writer type statically resolves to
    (unions resolve WITHOUT reading — a failed trial read would have
    consumed bytes)."""
    wn = _type_name(w)
    for rb in r_union:
        rn = _type_name(rb)
        if rn == wn or (wn, rn) in _PROMOTIONS:
            return rb
    raise SchemaResolutionError(
        f"writer {wn!r} matches no branch of reader union "
        f"{[_type_name(b) for b in r_union]}"
    )


def _default_value(field: dict):
    if "default" not in field:
        raise SchemaResolutionError(
            f"reader field {field['name']!r} absent from writer schema "
            "and declares no default"
        )
    d = field["default"]
    t = _strip_logical(field["type"])
    if isinstance(t, list):
        t = _strip_logical(t[0])  # union default types as the FIRST branch
    if t == "bytes" and isinstance(d, str):
        return d.encode("latin-1")  # the spec's bytes-default encoding
    if t in ("float", "double") and d is not None:
        return float(d)
    return d


def _decode_resolved(buf: io.BytesIO, w, r):
    w, r = _strip_logical(w), _strip_logical(r)
    if isinstance(w, list):  # writer union: decode branch, then resolve
        branch = read_long(buf)
        if not 0 <= branch < len(w):
            raise ValueError(f"union branch {branch} out of range")
        return _decode_resolved(buf, w[branch], r)
    if isinstance(r, list):  # reader union: static branch selection
        return _decode_resolved(buf, w, _first_compatible(w, r))
    if isinstance(w, dict) and w.get("type") == "record":
        if not (isinstance(r, dict) and r.get("type") == "record"):
            raise SchemaResolutionError(
                f"writer record does not resolve to reader {_type_name(r)!r}"
            )
        rf_by_name: dict[str, dict] = {}
        for rf in r["fields"]:
            rf_by_name.setdefault(rf["name"], rf)
            for alias in rf.get("aliases", ()):  # rename support
                rf_by_name.setdefault(alias, rf)
        out: dict = {}
        consumed: set[int] = set()
        for wf in w["fields"]:
            rf = rf_by_name.get(wf["name"])
            if rf is None or id(rf) in consumed:
                _skip_value(buf, wf["type"])  # writer-only field
            else:
                out[rf["name"]] = _decode_resolved(buf, wf["type"], rf["type"])
                consumed.add(id(rf))
        for rf in r["fields"]:
            if id(rf) not in consumed:
                out[rf["name"]] = _default_value(rf)
        return out
    v = _decode_value(buf, w)
    return _promote(v, _type_name(w), _type_name(r))


# -- container file ----------------------------------------------------


def write_ocf(
    path: str,
    schema: dict,
    rows,
    codec: str = "deflate",
    block_rows: int = 4096,
) -> int:
    """Write ``rows`` (dicts keyed by field name) as one Avro container
    file; returns the row count. Writes to a temp name and renames —
    the task-commit idiom, so readers never see a partial file."""
    if codec not in ("null", "deflate", "snappy", "bzip2", "xz",
                     "zstandard"):
        raise ValueError(f"unsupported codec {codec!r}")
    schema_json = json.dumps(schema, separators=(",", ":"))
    tmp = f"{path}.inprogress"
    n_total = 0
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        meta = io.BytesIO()
        write_long(meta, 2)  # one map block of two entries
        write_bytes(meta, b"avro.schema")
        write_bytes(meta, schema_json.encode())
        write_bytes(meta, b"avro.codec")
        write_bytes(meta, codec.encode())
        write_long(meta, 0)  # map terminator
        f.write(meta.getvalue())
        f.write(SYNC)

        block: list = []

        def flush():
            nonlocal n_total
            if not block:
                return
            payload = io.BytesIO()
            for r in block:
                _encode_value(payload, schema, r)
            data = payload.getvalue()
            if codec == "deflate":
                data = zlib.compress(data, 6)[2:-4]  # strip zlib wrap -> raw
            elif codec == "snappy":
                # Avro spec: raw snappy block + BE CRC-32 of the
                # PLAIN bytes (round 11, pure-Python codec)
                data = snappy_codec.avro_snappy_encode(data)
            elif codec == "bzip2":
                import bz2

                data = bz2.compress(data)
            elif codec == "xz":
                import lzma

                data = lzma.compress(data, format=lzma.FORMAT_XZ)
            elif codec == "zstandard":
                data = _zstd_compress(data)
            head = io.BytesIO()
            write_long(head, len(block))
            write_long(head, len(data))
            f.write(head.getvalue())
            f.write(data)
            f.write(SYNC)
            n_total += len(block)
            block.clear()

        for row in rows:
            block.append(row)
            if len(block) >= block_rows:
                flush()
        flush()
    os.replace(tmp, path)
    return n_total


def read_ocf(path: str, reader_schema: dict | None = None):
    """Yield row dicts from an Avro container file written by any
    conforming writer (sync marker verified per block, so truncation
    or mid-file corruption raises instead of yielding garbage).
    ``reader_schema`` switches on SCHEMA RESOLUTION: the file decodes
    with its embedded writer schema but yields the reader's shape
    (aliases renamed, defaults filled, writer-only fields skipped,
    promotions applied)."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:  # negative block count carries a byte size next
            read_long(buf)
            n = -n
        for _ in range(n):
            k = read_bytes(buf).decode()
            meta[k] = read_bytes(buf)
    if "avro.schema" not in meta:
        raise ValueError(f"{path}: file metadata lacks avro.schema")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy", "bzip2", "xz",
                     "zstandard"):
        raise NotImplementedError(f"avro codec {codec!r}")
    sync = buf.read(16)
    if len(sync) != 16:
        raise EOFError(f"{path}: header sync truncated")
    while True:
        probe = buf.read(1)
        if not probe:
            return
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)
        size = read_long(buf)
        data = buf.read(size)
        if len(data) != size:
            raise EOFError(f"{path}: data block truncated")
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        if codec == "deflate":
            try:
                data = zlib.decompress(data, -15)
            except zlib.error as e:
                raise ValueError(f"{path}: corrupt deflate block ({e})") from e
        elif codec == "snappy":
            try:
                data = snappy_codec.avro_snappy_decode(data)
            except ValueError as e:
                raise ValueError(f"{path}: corrupt snappy block ({e})") from e
        elif codec == "bzip2":
            import bz2

            try:
                data = bz2.decompress(data)
            except (OSError, ValueError) as e:
                raise ValueError(f"{path}: corrupt bzip2 block ({e})") from e
        elif codec == "xz":
            import lzma

            try:
                data = lzma.decompress(data)
            except lzma.LZMAError as e:
                raise ValueError(f"{path}: corrupt xz block ({e})") from e
        elif codec == "zstandard":
            data = _zstd_decompress(data, path)
        block = io.BytesIO(data)
        for _ in range(count):
            try:
                yield (
                    _decode_value(block, schema)
                    if reader_schema is None
                    else _decode_resolved(block, schema, reader_schema)
                )
            except (KeyError, TypeError, AttributeError, IndexError) as e:
                # a corrupt byte in the SCHEMA JSON yields a parseable
                # but mis-shaped schema node; surface the designed
                # rejection, not an accidental crash (failure class
                # pinned by tests/test_binary_reader_fuzz.py)
                raise ValueError(
                    f"{path}: malformed schema or record "
                    f"({type(e).__name__}: {e})"
                ) from e
        if block.read(1):
            raise ValueError(f"{path}: trailing bytes inside block")
