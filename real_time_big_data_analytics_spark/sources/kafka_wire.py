"""Minimal Kafka WIRE protocol: RecordBatch v2 + produce/fetch framing
(SURVEY.md §2.1 S2/S3 — the round-6 upgrade of the Kafka seam).

The sandbox has no broker binary, no spark-sql-kafka connector JAR, no
Python Kafka client, and no network to fetch any of them
(``tools/probe_kafka.py`` records the probe), so Spark's
``format("kafka")`` path cannot be exercised end-to-end. What CAN be
made real without any of that is the WIRE level: this module
implements, from the public Kafka protocol spec
(kafka.apache.org/protocol, KIP-98 record format):

- **RecordBatch v2** encode/decode — magic 2, CRC32C (Castagnoli,
  table-driven, implemented here since zlib only has CRC32-IEEE),
  zigzag-varint record framing, per-record key/value/headers,
  timestamp/offset deltas;
- request/response framing for **ApiVersions (key 18, v0)**,
  **Produce (key 0, v3)**, **Fetch (key 1, v4)** and
  **InitProducerId (key 22, v0)** — the minimal subset a loopback
  round-trip needs, versions chosen because they carry RecordBatch v2
  record sets with plain (non-flexible) headers;
- the **KIP-98 idempotent-producer mechanism** (round 10): batches
  stamp producerId/producerEpoch/baseSequence; the broker tracks the
  expected next sequence per (topic, partition, pid), silently acks a
  REPLAYED batch with its original offset (exactly-once produce under
  retries — the failure mode the reference sidesteps with
  ``retries=0``, ProducerFinal.scala:55), refuses sequence gaps
  (OUT_OF_ORDER_SEQUENCE_NUMBER) and stale epochs
  (INVALID_PRODUCER_EPOCH), and rewrites each batch's baseOffset at
  append (offset assignment);
- **KIP-98 transactions, both sides** (round 10): transactional
  batches (attributes bit 4), EndTxn (key 26) writing COMMIT/ABORT
  control batches (bit 5, the [version, type] marker record), the
  last-stable offset pinned by open transactions, Fetch
  isolation_level=READ_COMMITTED serving only below the LSO plus the
  abortedTransactions list, and the public consumer walk
  (``filter_read_committed``) that activates aborted pids at their
  first offset and deactivates at the marker;
- ``MiniBroker`` — an in-process TCP server speaking that subset over
  a REAL socket, storing produced batches per (topic, partition) and
  serving them back to fetches byte-identically.

``tests/test_kafka_wire.py`` drives ``encode_payload``-shaped rows
through produce → socket → fetch → decode and asserts exact roundtrip
plus CRC rejection of corrupted batches. This upgrades S2/S3 evidence
from string-contract pytest to wire-level framing; the remaining gap
(Spark's own connector behavior) is environment-blocked and disclosed.

Reference parity: the reference's producer/consumer
(ProducerFinal.scala:50-83, ConsumerESFinal.scala:40-47) exchange
String key/values over exactly this record format; the JSON payload
codec in ``sources/kafka.py`` is the fixed (§1.4.1) equivalent.
"""

from __future__ import annotations

import json
import os
import socket
import socketserver
import struct
import threading

# ---------------------------------------------------------------- CRC32C

_CRC32C_TABLE: list[int] = []


def _crc32c_table() -> list[int]:
    if not _CRC32C_TABLE:
        poly = 0x82F63B78  # reflected Castagnoli polynomial
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC32C_TABLE.append(c)
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli) — the checksum RecordBatch v2 mandates."""
    table = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------- varints


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_varint(n: int) -> bytes:
    """Zigzag varint (Kafka record framing)."""
    u = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u), pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


# ------------------------------------------------------- RecordBatch v2


# RecordBatch v2 attributes bits 0-2: the compression codec
# (kafka.apache.org/protocol "attributes"). none/gzip/snappy are
# implemented in-engine (snappy via the pure-Python codec in
# ``snappy_codec``, round 11 — the dominant codec on real topics).
# lz4 (3, the KIP-57 LZ4 FRAME format) and zstd (4, the zstd frame)
# ride pyarrow's C++ codecs — a baked-in dependency, probed at call
# time — closing the full five-codec matrix; where pyarrow lacks the
# codec the refusal stays loud, never a mis-decode.
CODEC_NONE, CODEC_GZIP, CODEC_SNAPPY, CODEC_LZ4, CODEC_ZSTD = 0, 1, 2, 3, 4
_CODEC_MASK = 0x07


def _pa_frame_compress(payload: bytes, codec_name: str) -> bytes:
    try:
        import pyarrow as pa

        return pa.compress(payload, codec=codec_name, asbytes=True)
    except ImportError as e:  # pragma: no cover - pyarrow is baked in
        raise ValueError(
            f"codec {codec_name} needs pyarrow, which is unavailable"
        ) from e


def _pa_frame_decompress(payload: bytes, codec_name: str) -> bytes:
    """Frame formats (LZ4F / zstd) self-describe their length, which
    ``pa.input_stream`` honors — no decompressed-size oracle needed."""
    try:
        import pyarrow as pa
    except ImportError as e:  # pragma: no cover - pyarrow is baked in
        raise ValueError(
            f"codec {codec_name} needs pyarrow, which is unavailable"
        ) from e
    try:
        return pa.input_stream(
            pa.py_buffer(payload), compression=codec_name
        ).read()
    except (pa.ArrowInvalid, pa.ArrowIOError, OSError) as e:
        raise ValueError(f"{codec_name} records section malformed: {e}") from e
# attributes bit 4: isTransactional; bit 5: isControl (the KIP-98
# transactional-messaging flags)
ATTR_TRANSACTIONAL = 0x10
ATTR_CONTROL = 0x20


def encode_record_batch(
    records: list[tuple[bytes | None, bytes]],
    *,
    base_offset: int = 0,
    base_timestamp: int = 0,
    codec: int = CODEC_NONE,
    producer_id: int = -1,
    producer_epoch: int = -1,
    base_sequence: int = -1,
    transactional: bool = False,
    control: bool = False,
) -> bytes:
    """[(key, value)] → one RecordBatch v2 (CreateTime, not
    transactional, not control). ``codec=CODEC_GZIP`` gzip-compresses
    the records section — the payload AFTER the 40 header bytes, per
    the spec — and flags it in attributes bits 0-2; the CRC covers the
    COMPRESSED bytes (it is computed over everything after the crc
    field, so corruption is caught before any inflate runs).

    ``producer_id``/``producer_epoch``/``base_sequence`` are the
    KIP-98 idempotence fields (round 10): a batch stamped with a
    broker-assigned PID and a per-partition sequence is deduplicated
    broker-side on replay; −1 (the default, and what the reference's
    ``retries=0`` producer effectively ships) means no dedup."""
    body = bytearray()
    for i, (key, value) in enumerate(records):
        rec = bytearray()
        rec += b"\x00"  # record attributes
        rec += write_varint(0)  # timestampDelta
        rec += write_varint(i)  # offsetDelta
        if key is None:
            rec += write_varint(-1)
        else:
            rec += write_varint(len(key)) + key
        rec += write_varint(len(value)) + value
        rec += write_varint(0)  # headers
        body += write_varint(len(rec)) + rec

    payload = bytes(body)
    if codec == CODEC_GZIP:
        import gzip

        # fixed mtime: byte-reproducible batches (same reason as the
        # avro deflate path)
        payload = gzip.compress(payload, mtime=0)
    elif codec == CODEC_SNAPPY:
        from . import snappy_codec

        # the xerial stream framing the Java client writes (and the
        # deterministic own-compressor keeps batches byte-reproducible)
        payload = snappy_codec.xerial_frame(payload)
    elif codec == CODEC_LZ4:
        payload = _pa_frame_compress(payload, "lz4")
    elif codec == CODEC_ZSTD:
        payload = _pa_frame_compress(payload, "zstd")
    elif codec != CODEC_NONE:
        raise ValueError(f"unsupported codec {codec}")
    n = len(records)
    attrs = codec
    if transactional:
        attrs |= ATTR_TRANSACTIONAL
    if control:
        attrs |= ATTR_CONTROL
    after_crc = (
        struct.pack(
            ">hiqqqhii",
            attrs,
            n - 1,
            base_timestamp,
            base_timestamp,
            producer_id,
            producer_epoch,
            base_sequence,
            n,
        )
        + payload
    )
    crc = crc32c(after_crc)
    # partitionLeaderEpoch(4) magic(1) crc(4) + after_crc
    tail = struct.pack(">ibI", -1, 2, crc) + after_crc
    return struct.pack(">qi", base_offset, len(tail)) + tail


def decode_record_batch(buf: bytes) -> list[tuple[bytes | None, bytes]]:
    """One RecordBatch v2 → [(key, value)], CRC-verified; the
    attributes codec bits are honored (none / gzip) BOTH directions —
    CRC is checked on the wire bytes first, then the records section
    inflates if flagged."""
    if len(buf) < 61:  # fixed envelope: 12 + 9 + 40 header bytes
        raise ValueError("truncated record batch")
    base_offset, batch_len = struct.unpack(">qi", buf[:12])
    if 12 + batch_len > len(buf):
        raise ValueError("truncated record batch")
    _epoch, magic, crc = struct.unpack(">ibI", buf[12:21])
    if magic != 2:
        raise ValueError(f"unsupported magic {magic}")
    after_crc = buf[21 : 12 + batch_len]
    if crc32c(after_crc) != crc:
        raise ValueError("record batch CRC mismatch")
    (attrs, _last_delta, _bts, _mts, _pid, _pepoch, _bseq, count) = struct.unpack(
        ">hiqqqhii", after_crc[:40]
    )
    codec = attrs & _CODEC_MASK
    if codec == CODEC_GZIP:
        import gzip
        import zlib

        try:
            records_section = gzip.decompress(bytes(after_crc[40:]))
        except (OSError, EOFError, zlib.error) as e:
            raise ValueError(f"gzip records section malformed: {e}") from e
        after_crc = after_crc[:40] + records_section
    elif codec == CODEC_SNAPPY:
        from . import snappy_codec

        # accept both public payload shapes: the xerial stream (Java
        # clients) and a bare raw block (librdkafka) — magic-sniffed
        records_section = snappy_codec.maybe_xerial_unframe(
            bytes(after_crc[40:])
        )
        after_crc = after_crc[:40] + records_section
    elif codec in (CODEC_LZ4, CODEC_ZSTD):
        records_section = _pa_frame_decompress(
            bytes(after_crc[40:]), "lz4" if codec == CODEC_LZ4 else "zstd"
        )
        after_crc = after_crc[:40] + records_section
    elif codec != CODEC_NONE:
        raise ValueError(f"unsupported codec {codec} in batch attributes")
    pos, out = 40, []
    for _ in range(count):
        rec_len, pos = read_varint(after_crc, pos)
        end = pos + rec_len
        pos += 1  # record attributes
        _, pos = read_varint(after_crc, pos)  # timestampDelta
        _, pos = read_varint(after_crc, pos)  # offsetDelta
        klen, pos = read_varint(after_crc, pos)
        key = None if klen < 0 else bytes(after_crc[pos : pos + klen])
        pos += max(klen, 0)
        vlen, pos = read_varint(after_crc, pos)
        value = bytes(after_crc[pos : pos + vlen])
        pos += vlen
        nh, pos = read_varint(after_crc, pos)
        for _ in range(nh):
            hk, pos = read_varint(after_crc, pos)
            pos += max(hk, 0)
            hv, pos = read_varint(after_crc, pos)
            pos += max(hv, 0)
        if pos != end:
            raise ValueError("record length mismatch")
        out.append((key, value))
    return out


def batch_attributes(buf: bytes) -> int:
    """The RecordBatch v2 attributes int16 (codec bits + the
    transactional/control flags)."""
    (attrs,) = struct.unpack(">h", buf[21:23])
    return attrs


# control-record types (the public ControlRecordType enum)
CTRL_ABORT, CTRL_COMMIT = 0, 1


def encode_control_batch(
    producer_id: int,
    producer_epoch: int,
    commit: bool,
    *,
    base_offset: int = 0,
) -> bytes:
    """One transaction MARKER: a control batch holding a single record
    whose key is [version int16 = 0][type int16 = commit|abort] — the
    record consumers never see but use to resolve transactional
    batches (KIP-98). Written by the broker at EndTxn, occupying one
    offset like any record."""
    key = struct.pack(">hh", 0, CTRL_COMMIT if commit else CTRL_ABORT)
    return encode_record_batch(
        [(key, b"")],
        base_offset=base_offset,
        producer_id=producer_id,
        producer_epoch=producer_epoch,
        transactional=True,
        control=True,
    )


def filter_read_committed_with_offsets(
    record_set: bytes, aborted: list[tuple[int, int]]
) -> list[tuple[int, bytes | None, bytes]]:
    """The READ_COMMITTED client algorithm (public consumer behavior):
    walk batches in offset order keeping an active set of aborted
    producer ids — a pid activates when the walk passes an aborted
    transaction's first offset (from the Fetch response's
    abortedTransactions list) and deactivates at that pid's next
    marker. Control batches are never delivered; records of an
    actively-aborted pid's transactional batches are dropped. Returns
    [(offset, key, value)]."""
    pending = sorted(aborted, key=lambda t: t[1])  # (pid, first_offset)
    active: set[int] = set()
    out: list[tuple[int, bytes | None, bytes]] = []
    for b in split_record_sets(record_set):
        (base,) = struct.unpack(">q", b[:8])
        while pending and pending[0][1] <= base:
            active.add(pending.pop(0)[0])
        attrs = batch_attributes(b)
        pid = batch_producer_info(b)[0]
        if attrs & ATTR_CONTROL:
            active.discard(pid)  # marker ends this pid's open txn
            continue
        if attrs & ATTR_TRANSACTIONAL and pid in active:
            continue  # aborted transaction's data
        out.extend(
            (base + i, k, v) for i, (k, v) in enumerate(decode_record_batch(b))
        )
    return out


def filter_read_committed(
    record_set: bytes, aborted: list[tuple[int, int]]
) -> list[tuple[bytes | None, bytes]]:
    return [
        (k, v)
        for _off, k, v in filter_read_committed_with_offsets(
            record_set, aborted
        )
    ]


def batch_producer_info(buf: bytes) -> tuple[int, int, int, int]:
    """(producerId, producerEpoch, baseSequence, recordCount) from one
    RecordBatch v2's fixed header — the fields the broker's KIP-98
    dedup keys on (header layout: 12-byte envelope + 9 bytes to the
    crc, then attributes/lastOffsetDelta/timestamps/pid/epoch/seq/
    count)."""
    (_a, _lod, _bt, _mt, pid, epoch, bseq, count) = struct.unpack(
        ">hiqqqhii", buf[21:61]
    )
    return pid, epoch, bseq, count


# --------------------------------------------------- request framing

API_PRODUCE, API_FETCH, API_VERSIONS = 0, 1, 18
API_INIT_PRODUCER_ID = 22
API_END_TXN = 26
# the consumer-group coordinator triple (round 11): committed-offset
# durability, the half of the reference's ``GROUP_ID_CONFIG ->
# "group"`` consumer contract (ConsumerESFinal.scala:43) that lives
# broker-side rather than in Structured Streaming checkpoints
API_OFFSET_COMMIT, API_OFFSET_FETCH, API_FIND_COORDINATOR = 8, 9, 10
# ListOffsets (round 11): how a consumer with NO committed offset
# resolves auto.offset.reset — earliest (-2) / latest (-1) — plus
# offset-for-timestamp lookup over the batch header timestamps
API_LIST_OFFSETS = 2
TS_EARLIEST, TS_LATEST = -2, -1

# public error codes the idempotent path uses
ERR_OUT_OF_ORDER_SEQUENCE = 45
ERR_INVALID_PRODUCER_EPOCH = 47

# Fetch isolation levels (public)
READ_UNCOMMITTED, READ_COMMITTED = 0, 1


def _str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _read_str(buf: bytes, pos: int) -> tuple[str | None, int]:
    (ln,) = struct.unpack(">h", buf[pos : pos + 2])
    pos += 2
    if ln < 0:
        return None, pos
    return buf[pos : pos + ln].decode(), pos + ln


def frame_request(
    api_key: int, api_version: int, correlation_id: int, body: bytes,
    client_id: str = "rtba",
) -> bytes:
    hdr = struct.pack(">hhi", api_key, api_version, correlation_id) + _str(client_id)
    return struct.pack(">i", len(hdr) + len(body)) + hdr + body


def produce_request_v3(topic: str, partition: int, record_set: bytes) -> bytes:
    """Produce v3 body: transactional_id, acks=-1, timeout, one
    topic/partition with an int32-length-delimited record set."""
    return (
        _str(None)
        + struct.pack(">hi", -1, 30000)
        + struct.pack(">i", 1)
        + _str(topic)
        + struct.pack(">i", 1)
        + struct.pack(">i", partition)
        + struct.pack(">i", len(record_set))
        + record_set
    )


def init_producer_id_request_v0(
    transactional_id: str | None = None, timeout_ms: int = 60000
) -> bytes:
    """InitProducerId v0 body (KIP-98): transactional_id (null for a
    plain idempotent producer) + transaction_timeout_ms."""
    return _str(transactional_id) + struct.pack(">i", timeout_ms)


def init_producer_id(sock: socket.socket, correlation_id: int = 0) -> tuple[int, int]:
    """Acquire a (producerId, producerEpoch) from the broker — the
    KIP-98 handshake every idempotent producer starts with."""
    resp = call(
        sock,
        frame_request(
            API_INIT_PRODUCER_ID, 0, correlation_id, init_producer_id_request_v0()
        ),
    )
    _throttle, err, pid, epoch = struct.unpack(">ihqh", resp[:16])
    if err != 0:
        raise IOError(f"InitProducerId refused: error {err}")
    return pid, epoch


def end_txn_request_v0(
    transactional_id: str, producer_id: int, producer_epoch: int, commit: bool
) -> bytes:
    """EndTxn v0 body (KIP-98): the producer asks for COMMIT or ABORT
    markers to be written to every partition its transaction touched."""
    return (
        _str(transactional_id)
        + struct.pack(">qh", producer_id, producer_epoch)
        + struct.pack(">b", 1 if commit else 0)
    )


def end_txn(
    sock: socket.socket,
    transactional_id: str,
    producer_id: int,
    producer_epoch: int,
    commit: bool,
    correlation_id: int = 0,
) -> None:
    resp = call(
        sock,
        frame_request(
            API_END_TXN,
            0,
            correlation_id,
            end_txn_request_v0(
                transactional_id, producer_id, producer_epoch, commit
            ),
        ),
    )
    _throttle, err = struct.unpack(">ih", resp[:6])
    if err != 0:
        raise IOError(f"EndTxn refused: error {err}")


def find_coordinator(
    sock: socket.socket, group: str, correlation_id: int = 0
) -> tuple[str, int]:
    """FindCoordinator v0 (group key) → (host, port). The real client
    dance: locate the group's coordinator before any offset RPC."""
    resp = call(
        sock,
        frame_request(
            API_FIND_COORDINATOR, 0, correlation_id, _str(group)
        ),
    )
    err, _node = struct.unpack(">hi", resp[:6])
    if err != 0:
        raise IOError(f"FindCoordinator refused: error {err}")
    host, pos = _read_str(resp, 6)
    (port,) = struct.unpack(">i", resp[pos : pos + 4])
    return host, port


def list_offsets(
    sock: socket.socket,
    topic: str,
    partition: int,
    timestamp: int = TS_EARLIEST,
    correlation_id: int = 0,
) -> int:
    """ListOffsets v1 for one partition → the resolved offset
    (earliest/latest/first-at-or-after-timestamp)."""
    body = struct.pack(">i", -1) + struct.pack(">i", 1) + _str(topic)
    body += struct.pack(">i", 1) + struct.pack(">iq", partition, timestamp)
    resp = call(
        sock, frame_request(API_LIST_OFFSETS, 1, correlation_id, body)
    )
    pos = 4  # ntopics
    _topic, pos = _read_str(resp, pos)
    pos += 4  # nparts
    _p, err, _ts, off = struct.unpack(">ihqq", resp[pos : pos + 22])
    if err != 0:
        raise IOError(f"ListOffsets refused: error {err}")
    return off


def offset_commit(
    sock: socket.socket,
    group: str,
    topic: str,
    offsets: dict[int, int],
    correlation_id: int = 0,
) -> None:
    """OffsetCommit v0 for one topic; raises on any partition error
    (including the coordinator's monotonicity refusal)."""
    body = _str(group) + struct.pack(">i", 1) + _str(topic)
    body += struct.pack(">i", len(offsets))
    for partition in sorted(offsets):
        body += struct.pack(">iq", partition, offsets[partition]) + _str("")
    resp = call(
        sock, frame_request(API_OFFSET_COMMIT, 0, correlation_id, body)
    )
    pos = 4  # ntopics
    _topic, pos = _read_str(resp, pos)
    (nparts,) = struct.unpack(">i", resp[pos : pos + 4])
    pos += 4
    for _ in range(nparts):
        partition, err = struct.unpack(">ih", resp[pos : pos + 6])
        pos += 6
        if err != 0:
            raise IOError(
                f"OffsetCommit refused for partition {partition}: error {err}"
            )


def offset_fetch(
    sock: socket.socket,
    group: str,
    topic: str,
    partitions: list[int],
    correlation_id: int = 0,
) -> dict[int, int]:
    """OffsetFetch v1 (broker-stored offsets) → {partition: committed
    offset}, −1 where the group never committed."""
    body = _str(group) + struct.pack(">i", 1) + _str(topic)
    body += struct.pack(">i", len(partitions))
    for partition in partitions:
        body += struct.pack(">i", partition)
    resp = call(
        sock, frame_request(API_OFFSET_FETCH, 1, correlation_id, body)
    )
    pos = 4  # ntopics
    _topic, pos = _read_str(resp, pos)
    (nparts,) = struct.unpack(">i", resp[pos : pos + 4])
    pos += 4
    out: dict[int, int] = {}
    for _ in range(nparts):
        partition, off = struct.unpack(">iq", resp[pos : pos + 12])
        pos += 12
        _meta_s, pos = _read_str(resp, pos)
        (err,) = struct.unpack(">h", resp[pos : pos + 2])
        pos += 2
        if err != 0:
            raise IOError(
                f"OffsetFetch refused for partition {partition}: error {err}"
            )
        out[partition] = off
    return out


def fetch_request_v4(
    topic: str,
    partition: int,
    offset: int = 0,
    isolation: int = READ_UNCOMMITTED,
) -> bytes:
    """Fetch v4 body: replica=-1, max_wait, min_bytes, max_bytes,
    isolation level, one topic/partition."""
    return (
        struct.pack(">iiiib", -1, 100, 1, 1 << 20, isolation)
        + struct.pack(">i", 1)
        + _str(topic)
        + struct.pack(">i", 1)
        + struct.pack(">iqi", partition, offset, 1 << 20)
    )


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("socket closed mid-frame")
        buf += chunk
    return bytes(buf)


def call(sock: socket.socket, payload: bytes) -> bytes:
    """Send one framed request, return the response body (after the
    echoed correlation id)."""
    sock.sendall(payload)
    (size,) = struct.unpack(">i", _recv_exact(sock, 4))
    resp = _recv_exact(sock, size)
    return resp[4:]  # strip correlation id


# --------------------------------------------------------- MiniBroker


class MiniBroker:
    """In-process single-node 'broker' speaking the subset above over a
    real TCP socket: ApiVersions v0, Produce v3 (stores the record set
    per topic/partition), Fetch v4 (serves stored batches back
    byte-identically). One thread, loopback only — a test harness, not
    a Kafka reimplementation; everything outside the subset returns
    error_code 35 (UNSUPPORTED_VERSION)."""

    def __init__(self, data_dir: str | None = None):
        """``data_dir`` turns on log + committed-offset durability
        (round 11): every appended batch goes to a per-partition
        segment file and every OffsetCommit to an append-only
        ``offsets.jsonl``; a new MiniBroker pointed at the same dir
        replays both at startup — which is what lets the group-resume
        staging 'crash' the broker mid-consume and prove the consumer
        position survives. Producer/transaction state is deliberately
        NOT persisted (real brokers snapshot it; nothing here depends
        on it across restarts)."""
        self._data_dir = data_dir
        self.log: dict[tuple[str, int], list[bytes]] = {}
        # Per-partition offset metadata kept beside the raw batches:
        # _meta[key] = [(base_offset, record_count)] and _counts[key]
        # = next offset. Appends and fetches previously re-DECODED the
        # whole log to compute offsets — O(batches²) CRC+varint work
        # that made large-topic staging quadratic (surfaced by the
        # 10× sf1 run); real brokers keep exactly this index.
        self._meta: dict[tuple[str, int], list[tuple[int, int]]] = {}
        self._counts: dict[tuple[str, int], int] = {}
        # Concurrent producers (one per Spark task in the distributed
        # produce path) race on the base-offset read + append below;
        # ThreadingTCPServer gives each connection its own thread.
        self._produce_lock = threading.Lock()
        # KIP-98 idempotence state: PIDs handed out by InitProducerId,
        # and per (topic, partition, pid) the expected next sequence
        # plus a bounded cache of recent batch (baseSeq -> baseOffset)
        # for silent-dup acks (real brokers keep the last 5 batches'
        # metadata — the max.in.flight bound).
        self._next_pid = 0
        self._producers: dict[tuple[str, int, int], dict] = {}
        # KIP-98 transactions: per (topic, partition) the OPEN
        # transactions {pid: first_offset} (they hold the LSO down)
        # and the closed ABORTED ones [(pid, first_offset)] consumers
        # need to resolve read_committed fetches.
        self._open_txns: dict[tuple[str, int], dict[int, int]] = {}
        self._aborted_txns: dict[tuple[str, int], list[tuple[int, int]]] = {}
        # consumer-group committed offsets: (group, topic, partition)
        # -> next offset to consume (the Kafka convention: commit the
        # offset AFTER the last processed record)
        self._group_offsets: dict[tuple[str, str, int], int] = {}
        if data_dir:
            self._load_data_dir()
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    while True:
                        (size,) = struct.unpack(
                            ">i", _recv_exact(self.request, 4)
                        )
                        req = _recv_exact(self.request, size)
                        self.request.sendall(broker._respond(req))
                except (ConnectionError, struct.error):
                    return

        self._server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
        self._server.daemon_threads = True
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    # -- lifecycle ----------------------------------------------------
    def start(self) -> str:
        self._thread.start()
        host, port = self._server.server_address
        return f"{host}:{port}"

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # -- durability (round 11) ----------------------------------------
    def _segment_path(self, key: tuple[str, int]) -> str:
        return os.path.join(self._data_dir, f"{key[0]}__{key[1]}.log")

    def _load_data_dir(self) -> None:
        """Replay segment files (self-delimiting RecordBatch framing)
        and the committed-offset journal. The offset index rebuilds
        from each batch's header fields alone — no record decode."""
        os.makedirs(self._data_dir, exist_ok=True)
        for fn in sorted(os.listdir(self._data_dir)):
            if not fn.endswith(".log"):
                continue
            topic, _, part = fn[:-4].rpartition("__")
            key = (topic, int(part))
            with open(os.path.join(self._data_dir, fn), "rb") as f:
                raw = f.read()
            for b in split_record_sets(raw):
                (base,) = struct.unpack(">q", b[:8])
                (count,) = struct.unpack(">i", b[57:61])
                self.log.setdefault(key, []).append(b)
                self._meta.setdefault(key, []).append((base, count))
                self._counts[key] = base + count
        journal = os.path.join(self._data_dir, "offsets.jsonl")
        if os.path.exists(journal):
            with open(journal) as f:
                for line in f:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    self._group_offsets[
                        (rec["group"], rec["topic"], int(rec["partition"]))
                    ] = int(rec["offset"])

    def _store_batch(
        self, key: tuple[str, int], stored: bytes, base: int, n_recs: int
    ) -> None:
        """Append one (offset-rewritten) batch to the in-memory log +
        offset index, and — when durable — to the partition's segment
        file. Caller holds ``_produce_lock``."""
        self.log.setdefault(key, []).append(stored)
        self._meta.setdefault(key, []).append((base, n_recs))
        self._counts[key] = base + n_recs
        if self._data_dir:
            with open(self._segment_path(key), "ab") as f:
                f.write(stored)

    def _commit_offset(
        self, group: str, topic: str, partition: int, offset: int
    ) -> None:
        self._group_offsets[(group, topic, partition)] = offset
        if self._data_dir:
            with open(os.path.join(self._data_dir, "offsets.jsonl"), "a") as f:
                f.write(
                    json.dumps(
                        {
                            "group": group,
                            "topic": topic,
                            "partition": partition,
                            "offset": offset,
                        }
                    )
                    + "\n"
                )

    # -- protocol -----------------------------------------------------
    def _respond(self, req: bytes) -> bytes:
        api_key, api_version, corr = struct.unpack(">hhi", req[:8])
        _, pos = _read_str(req, 8)  # client_id
        body = req[pos:]
        if api_key == API_VERSIONS:
            supported = (
                (API_PRODUCE, 3, 3),
                (API_FETCH, 4, 4),
                (API_VERSIONS, 0, 0),
                (API_INIT_PRODUCER_ID, 0, 0),
                (API_END_TXN, 0, 0),
                (API_OFFSET_COMMIT, 0, 0),
                (API_OFFSET_FETCH, 1, 1),
                (API_FIND_COORDINATOR, 0, 0),
                (API_LIST_OFFSETS, 1, 1),
            )
            out = struct.pack(">h", 0) + struct.pack(">i", len(supported))
            for k, lo, hi in supported:
                out += struct.pack(">hhh", k, lo, hi)
        elif api_key == API_PRODUCE and api_version == 3:
            out = self._produce(body)
        elif api_key == API_FETCH and api_version == 4:
            out = self._fetch(body)
        elif api_key == API_INIT_PRODUCER_ID and api_version == 0:
            with self._produce_lock:
                pid = self._next_pid
                self._next_pid += 1
            # throttle, error, producer_id, producer_epoch
            out = struct.pack(">ihqh", 0, 0, pid, 0)
        elif api_key == API_END_TXN and api_version == 0:
            out = self._end_txn(body)
        elif api_key == API_LIST_OFFSETS and api_version == 1:
            out = self._list_offsets(body)
        elif api_key == API_OFFSET_COMMIT and api_version == 0:
            out = self._offset_commit(body)
        elif api_key == API_OFFSET_FETCH and api_version == 1:
            out = self._offset_fetch(body)
        elif api_key == API_FIND_COORDINATOR and api_version == 0:
            # single-node broker IS its own group coordinator; v0 is
            # group-keyed by definition. err, node_id, host, port
            _group, _ = _read_str(body, 0)
            host, port = self._server.server_address
            out = struct.pack(">hi", 0, 0) + _str(host) + struct.pack(
                ">i", port
            )
        else:
            out = struct.pack(">h", 35)  # UNSUPPORTED_VERSION
        return struct.pack(">i", 4 + len(out)) + struct.pack(">i", corr) + out

    def _produce(self, body: bytes) -> bytes:
        _txn, pos = _read_str(body, 0)
        _acks, _timeout, ntopics = struct.unpack(">hii", body[pos : pos + 10])
        pos += 10
        resp_topics = b""
        for _ in range(ntopics):
            topic, pos = _read_str(body, pos)
            (nparts,) = struct.unpack(">i", body[pos : pos + 4])
            pos += 4
            parts = b""
            for _ in range(nparts):
                partition, set_len = struct.unpack(">iI", body[pos : pos + 8])
                pos += 8
                record_set = body[pos : pos + set_len]
                pos += set_len
                key = (topic, partition)
                # validate before acking — a corrupt batch is refused
                try:
                    batches = split_record_sets(record_set)
                    n_records = [len(decode_record_batch(b)) for b in batches]
                except ValueError:
                    parts += struct.pack(">ihqq", partition, 2, -1, -1)  # CORRUPT_MESSAGE
                    continue
                err, first_offset = 0, -1
                with self._produce_lock:
                    for b, n_recs in zip(batches, n_records):
                        pid, epoch, bseq, count = batch_producer_info(b)
                        if pid >= 0:
                            st = self._producers.setdefault(
                                (topic, partition, pid),
                                {"epoch": epoch, "next_seq": 0, "dups": {}},
                            )
                            if epoch < st["epoch"]:
                                err = ERR_INVALID_PRODUCER_EPOCH
                                break
                            if epoch > st["epoch"]:
                                # bumped epoch resets the sequence (the
                                # public fencing rule)
                                st.update(epoch=epoch, next_seq=0, dups={})
                            if bseq in st["dups"]:
                                # KIP-98 silent dedup: ack the EXISTING
                                # batch's offset, append nothing
                                if first_offset < 0:
                                    first_offset = st["dups"][bseq]
                                continue
                            if bseq != st["next_seq"]:
                                err = ERR_OUT_OF_ORDER_SEQUENCE
                                break
                        base = self._counts.get(key, 0)
                        # offset assignment: the broker REWRITES the
                        # batch's baseOffset to its log position (the
                        # producer stamps 0) — baseOffset sits outside
                        # the CRC, so the bytes stay CRC-valid and
                        # consumers compute true record offsets
                        # (base + i), which positioned fetches depend on
                        self._store_batch(
                            key, struct.pack(">q", base) + b[8:], base, n_recs
                        )
                        if first_offset < 0:
                            first_offset = base
                        if pid >= 0:
                            st["next_seq"] = bseq + count
                            st["dups"][bseq] = base
                            while len(st["dups"]) > 5:  # the in-flight bound
                                st["dups"].pop(min(st["dups"]))
                            if batch_attributes(b) & ATTR_TRANSACTIONAL:
                                # first transactional batch opens the
                                # txn on this partition (holds the LSO)
                                self._open_txns.setdefault(key, {}).setdefault(
                                    pid, base
                                )
                parts += struct.pack(">ihqq", partition, err, first_offset, -1)
            resp_topics += _str(topic) + struct.pack(">i", nparts) + parts
        return (
            struct.pack(">i", ntopics) + resp_topics + struct.pack(">i", 0)
        )  # throttle_time

    def _end_txn(self, body: bytes) -> bytes:
        """EndTxn v0: write a COMMIT/ABORT control batch to every
        partition this producer's transaction touched (the coordinator
        + WriteTxnMarkers collapse for a single-node broker), close
        the open txn (releasing the LSO) and, on abort, record the
        (pid, first_offset) entry read_committed fetches serve."""
        _txn_id, pos = _read_str(body, 0)
        pid, epoch, committed = struct.unpack(">qhb", body[pos : pos + 11])
        with self._produce_lock:
            for key, open_txns in list(self._open_txns.items()):
                if pid not in open_txns:
                    continue
                first = open_txns.pop(pid)
                base = self._counts.get(key, 0)
                self._store_batch(
                    key,
                    encode_control_batch(
                        pid, epoch, bool(committed), base_offset=base
                    ),
                    base,
                    1,
                )
                if not committed:
                    self._aborted_txns.setdefault(key, []).append((pid, first))
        return struct.pack(">ih", 0, 0)  # throttle, error

    def _list_offsets(self, body: bytes) -> bytes:
        """ListOffsets v1: replica + [topic + [partition, timestamp]]
        -> [topic + [partition, error, timestamp, offset]]. −2 =
        earliest (log start, 0 here — no retention deletes), −1 =
        latest (high watermark), T >= 0 = the first offset whose batch
        could hold a record at/after T, resolved from the batch HEADER
        maxTimestamp fields (bytes 35..43 of each stored batch — no
        record decode), exactly the index walk a real broker does over
        its time index."""
        pos = 4  # replica_id
        (ntopics,) = struct.unpack(">i", body[pos : pos + 4])
        pos += 4
        out = struct.pack(">i", ntopics)
        for _ in range(ntopics):
            topic, pos = _read_str(body, pos)
            (nparts,) = struct.unpack(">i", body[pos : pos + 4])
            pos += 4
            parts = b""
            for _ in range(nparts):
                partition, ts = struct.unpack(">iq", body[pos : pos + 12])
                pos += 12
                key = (topic, partition)
                with self._produce_lock:
                    hw = self._counts.get(key, 0)
                    if ts == TS_LATEST:
                        off = hw
                    elif ts == TS_EARLIEST:
                        off = 0
                    else:
                        off = hw  # nothing at/after ts -> latest
                        for b, (base, _n) in zip(
                            self.log.get(key, []), self._meta.get(key, [])
                        ):
                            (max_ts,) = struct.unpack(">q", b[35:43])
                            if max_ts >= ts:
                                off = base
                                break
                parts += struct.pack(">ihqq", partition, 0, ts, off)
            out += _str(topic) + struct.pack(">i", nparts) + parts
        return out

    def _offset_commit(self, body: bytes) -> bytes:
        """OffsetCommit v0: group + [topic + [partition, offset,
        metadata]] -> [topic + [partition, error]]. A commit BEHIND
        an existing committed offset is refused (error 55,
        OFFSET_NOT_AVAILABLE stands in for the monotonicity guard a
        real coordinator's generation fencing provides) so a zombie
        consumer cannot rewind the group."""
        group, pos = _read_str(body, 0)
        (ntopics,) = struct.unpack(">i", body[pos : pos + 4])
        pos += 4
        out = struct.pack(">i", ntopics)
        for _ in range(ntopics):
            topic, pos = _read_str(body, pos)
            (nparts,) = struct.unpack(">i", body[pos : pos + 4])
            pos += 4
            parts = b""
            for _ in range(nparts):
                partition, offset = struct.unpack(">iq", body[pos : pos + 12])
                pos += 12
                _meta_s, pos = _read_str(body, pos)
                with self._produce_lock:
                    prev = self._group_offsets.get(
                        (group, topic, partition), -1
                    )
                    if offset < prev:
                        parts += struct.pack(">ih", partition, 55)
                        continue
                    self._commit_offset(group, topic, partition, offset)
                parts += struct.pack(">ih", partition, 0)
            out += _str(topic) + struct.pack(">i", nparts) + parts
        return out

    def _offset_fetch(self, body: bytes) -> bytes:
        """OffsetFetch v1 (broker-stored offsets): group + [topic +
        [partition]] -> [topic + [partition, offset, metadata,
        error]]; an uncommitted partition answers offset −1 (the
        consumer starts from auto.offset.reset)."""
        group, pos = _read_str(body, 0)
        (ntopics,) = struct.unpack(">i", body[pos : pos + 4])
        pos += 4
        out = struct.pack(">i", ntopics)
        for _ in range(ntopics):
            topic, pos = _read_str(body, pos)
            (nparts,) = struct.unpack(">i", body[pos : pos + 4])
            pos += 4
            parts = b""
            for _ in range(nparts):
                (partition,) = struct.unpack(">i", body[pos : pos + 4])
                pos += 4
                off = self._group_offsets.get((group, topic, partition), -1)
                parts += struct.pack(">iq", partition, off) + _str("")
                parts += struct.pack(">h", 0)
            out += _str(topic) + struct.pack(">i", nparts) + parts
        return out

    def _fetch(self, body: bytes) -> bytes:
        # replica, max_wait, min_bytes, max_bytes, isolation
        isolation = body[16]
        pos = 4 + 4 + 4 + 4 + 1
        (ntopics,) = struct.unpack(">i", body[pos : pos + 4])
        pos += 4
        out = struct.pack(">i", 0) + struct.pack(">i", ntopics)  # throttle, topics
        for _ in range(ntopics):
            topic, pos = _read_str(body, pos)
            (nparts,) = struct.unpack(">i", body[pos : pos + 4])
            pos += 4
            out += _str(topic) + struct.pack(">i", nparts)
            for _ in range(nparts):
                partition, offset, _maxb = struct.unpack(
                    ">iqi", body[pos : pos + 16]
                )
                pos += 16
                key = (topic, partition)
                batches = self.log.get(key, [])
                meta = self._meta.get(key, [])
                open_txns = self._open_txns.get(key, {})
                hw = self._counts.get(key, 0)
                # LSO: first offset of any OPEN transaction — nothing
                # at/after it is stable yet
                lso = min(open_txns.values()) if open_txns else hw
                limit = lso if isolation == READ_COMMITTED else hw
                # Honor the requested fetch offset (ADVICE r6): serve
                # only batches that still contain records at >= offset
                # and (read_committed) below the LSO. Batch granularity
                # matches real Kafka semantics — a fetch from mid-batch
                # returns the whole batch and the consumer skips
                # records below its position. Selection runs on the
                # offset INDEX — no batch decode on the fetch path.
                served = [
                    b
                    for b, (base, count) in zip(batches, meta)
                    if base + count > offset and base < limit
                ]
                aborted: list[tuple[int, int]] = []
                if isolation == READ_COMMITTED:
                    aborted = [
                        (apid, first)
                        for apid, first in self._aborted_txns.get(key, [])
                        if first < limit
                    ]
                record_set = b"".join(served)
                # partition, error, high_watermark, last_stable,
                # abortedTransactions [(producer_id, first_offset)...]
                out += struct.pack(
                    ">ihqqi", partition, 0, hw, lso, len(aborted)
                )
                for apid, first in aborted:
                    out += struct.pack(">qq", apid, first)
                out += struct.pack(">i", len(record_set)) + record_set
        return out


def parse_produce_response(resp: bytes) -> tuple[int, int]:
    """Produce v3 response body (correlation id already stripped) →
    ``(error_code, base_offset)`` for the single (topic, partition)
    this repo's producers send per request. Layout: ntopics(int32) +
    topic(str16) + nparts(int32) + partition(int32) + error(int16) +
    base_offset(int64) + log_append_time(int64) — so the error code
    sits at ``14 + len(topic)``, AFTER the partition int32. Producers
    must raise on a nonzero error or broker refusals
    (OUT_OF_ORDER_SEQUENCE, INVALID_PRODUCER_EPOCH, CORRUPT_MESSAGE)
    are silently swallowed during staging."""
    (tlen,) = struct.unpack(">h", resp[4:6])
    pos = 6 + tlen + 4
    _partition, err, offset = struct.unpack(">ihq", resp[pos : pos + 14])
    return err, offset


def parse_fetch_response(resp: bytes) -> dict[tuple[str, int], dict]:
    """Fetch v4 response body → {(topic, partition): {"record_set",
    "high_watermark", "last_stable", "aborted": [(pid, first_offset)]}}
    — the full per-partition payload a read_committed consumer needs."""
    pos = 4  # throttle_time
    (ntopics,) = struct.unpack(">i", resp[pos : pos + 4])
    pos += 4
    out: dict[tuple[str, int], dict] = {}
    for _ in range(ntopics):
        topic, pos = _read_str(resp, pos)
        (nparts,) = struct.unpack(">i", resp[pos : pos + 4])
        pos += 4
        for _ in range(nparts):
            partition, _err, hw, ls, naborted = struct.unpack(
                ">ihqqi", resp[pos : pos + 26]
            )
            pos += 26
            aborted = []
            for _ in range(naborted):
                apid, first = struct.unpack(">qq", resp[pos : pos + 16])
                pos += 16
                aborted.append((apid, first))
            (set_len,) = struct.unpack(">i", resp[pos : pos + 4])
            pos += 4
            out[(topic, partition)] = {
                "record_set": resp[pos : pos + set_len],
                "high_watermark": hw,
                "last_stable": ls,
                "aborted": aborted,
            }
            pos += set_len
    return out


def parse_fetch_record_sets(resp: bytes) -> dict[tuple[str, int], bytes]:
    """Fetch v4 response body → {(topic, partition): record_set bytes}."""
    return {
        k: v["record_set"] for k, v in parse_fetch_response(resp).items()
    }


def split_record_sets(record_set: bytes) -> list[bytes]:
    """A fetch record_set may concatenate several batches; split on the
    baseOffset/batchLength envelope."""
    out, pos = [], 0
    while pos + 12 <= len(record_set):
        (batch_len,) = struct.unpack(">i", record_set[pos + 8 : pos + 12])
        end = pos + 12 + batch_len
        if end > len(record_set):
            raise ValueError("truncated batch in record set")
        out.append(record_set[pos:end])
        pos = end
    return out
