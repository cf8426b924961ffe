"""Wire-level Kafka evidence (S2/S3, VERDICT r5 ask #6): the JSON
payload codec round-trips through REAL RecordBatch v2 bytes over a
REAL loopback TCP socket against the in-process MiniBroker.

The Spark connector itself (spark-sql-kafka JAR) is absent from the
sandbox — tools/probe_kafka.py records that — so these tests pin every
byte layer beneath it: CRC32C, zigzag varints, record framing,
produce/fetch request framing, and corruption rejection.
"""

from __future__ import annotations

import json
import socket
import struct

import pytest

from real_time_big_data_analytics_spark.sources import kafka_wire as KW


# ------------------------------------------------------------- primitives


def test_crc32c_known_vectors():
    """Public CRC-32C check vectors (RFC 3720 appendix / common test
    strings) — zlib.crc32 (IEEE) must NOT match these."""
    import zlib

    assert KW.crc32c(b"") == 0
    assert KW.crc32c(b"123456789") == 0xE3069283
    assert KW.crc32c(b"a") == 0xC1D04330
    assert KW.crc32c(bytes(32)) == 0x8A9136AA
    assert zlib.crc32(b"123456789") != KW.crc32c(b"123456789")


def test_varint_zigzag_roundtrip():
    for n in (0, 1, -1, 63, -64, 64, 300, -300, 2**31 - 1, -(2**31), 2**40):
        buf = KW.write_varint(n)
        got, pos = KW.read_varint(buf, 0)
        assert (got, pos) == (n, len(buf)), n


def test_record_batch_roundtrip_and_crc_rejection():
    records = [
        (b"k1", b'{"user_id": 1, "value": 2.5}'),
        (None, b'{"user_id": 2, "value": "a,b,c"}'),  # null key + embedded commas
        (b"k3", b""),
    ]
    batch = KW.encode_record_batch(records, base_offset=7, base_timestamp=1234)
    assert KW.decode_record_batch(batch) == records
    corrupt = bytearray(batch)
    corrupt[-1] ^= 0xFF  # flip a payload byte → CRC32C must catch it
    with pytest.raises(ValueError, match="CRC"):
        KW.decode_record_batch(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated"):
        KW.decode_record_batch(batch[: len(batch) // 2])


# ------------------------------------------------------------ loopback


@pytest.fixture()
def broker():
    b = KW.MiniBroker()
    addr = b.start()
    yield b, addr
    b.stop()


def _connect(addr: str) -> socket.socket:
    host, port = addr.rsplit(":", 1)
    return socket.create_connection((host, int(port)), timeout=5)


def test_api_versions_handshake(broker):
    _, addr = broker
    with _connect(addr) as sock:
        resp = KW.call(
            sock, KW.frame_request(KW.API_VERSIONS, 0, correlation_id=1, body=b"")
        )
    err, napis = struct.unpack(">hi", resp[:6])
    assert err == 0
    apis = {
        struct.unpack(">hhh", resp[6 + 6 * i : 12 + 6 * i])[0] for i in range(napis)
    }
    assert {KW.API_PRODUCE, KW.API_FETCH, KW.API_VERSIONS} <= apis


def test_produce_fetch_roundtrip_preserves_payload_codec(broker):
    """encode_payload-shaped rows (JSON value, entity key — the §1.4.1
    fix) survive produce → socket → fetch → decode byte-exactly,
    including embedded commas that corrupted the reference's CSV."""
    _, addr = broker
    rows = [
        {"user_id": 1, "location": "a,b", "lang": "en", "statuses_count": 10},
        {"user_id": 2, "location": None, "lang": "hr", "statuses_count": 0},
    ]
    records = [
        (str(r["user_id"]).encode(), json.dumps(r, sort_keys=True).encode())
        for r in rows
    ]
    batch = KW.encode_record_batch(records)
    with _connect(addr) as sock:
        presp = KW.call(
            sock,
            KW.frame_request(
                KW.API_PRODUCE, 3, 2, KW.produce_request_v3("events", 0, batch)
            ),
        )
        fresp = KW.call(
            sock,
            KW.frame_request(KW.API_FETCH, 4, 3, KW.fetch_request_v4("events", 0)),
        )
    # produce ack: topic echoed, error 0, base offset 0
    (ntopics,) = struct.unpack(">i", presp[:4])
    assert ntopics == 1
    sets = KW.parse_fetch_record_sets(fresp)
    got = [
        rec
        for b in KW.split_record_sets(sets[("events", 0)])
        for rec in KW.decode_record_batch(b)
    ]
    assert got == records
    decoded = [json.loads(v) for _, v in got]
    assert decoded == [json.loads(json.dumps(r, sort_keys=True)) for r in rows]
    assert decoded[0]["location"] == "a,b"


def test_multiple_produces_accumulate_and_fetch_all(broker):
    _, addr = broker
    with _connect(addr) as sock:
        for i in range(3):
            batch = KW.encode_record_batch(
                [(b"k", f"v{i}".encode())], base_offset=i
            )
            KW.call(
                sock,
                KW.frame_request(
                    KW.API_PRODUCE, 3, 10 + i, KW.produce_request_v3("t", 0, batch)
                ),
            )
        fresp = KW.call(
            sock, KW.frame_request(KW.API_FETCH, 4, 20, KW.fetch_request_v4("t", 0))
        )
    sets = KW.parse_fetch_record_sets(fresp)
    vals = [
        v
        for b in KW.split_record_sets(sets[("t", 0)])
        for _, v in KW.decode_record_batch(b)
    ]
    assert vals == [b"v0", b"v1", b"v2"]


def test_fetch_honors_nonzero_offset(broker):
    """A fetch from offset N skips batches wholly below N (ADVICE r6:
    _fetch previously served the full log from 0 regardless)."""
    _, addr = broker
    with _connect(addr) as sock:
        for i in range(3):  # three 2-record batches → offsets 0..5
            batch = KW.encode_record_batch(
                [(b"k", f"v{2 * i}".encode()), (b"k", f"v{2 * i + 1}".encode())],
                base_offset=2 * i,
            )
            KW.call(
                sock,
                KW.frame_request(
                    KW.API_PRODUCE, 3, 30 + i, KW.produce_request_v3("o", 0, batch)
                ),
            )
        by_offset = {}
        for off in (0, 2, 3, 4, 6):
            fresp = KW.call(
                sock,
                KW.frame_request(
                    KW.API_FETCH, 4, 40 + off, KW.fetch_request_v4("o", 0, offset=off)
                ),
            )
            sets = KW.parse_fetch_record_sets(fresp)
            by_offset[off] = [
                v
                for b in KW.split_record_sets(sets[("o", 0)])
                for _, v in KW.decode_record_batch(b)
            ]
    assert by_offset[0] == [b"v0", b"v1", b"v2", b"v3", b"v4", b"v5"]
    assert by_offset[2] == [b"v2", b"v3", b"v4", b"v5"]
    # mid-batch fetch returns the containing batch (real Kafka
    # semantics: consumer-side skip below position)
    assert by_offset[3] == [b"v2", b"v3", b"v4", b"v5"]
    assert by_offset[4] == [b"v4", b"v5"]
    assert by_offset[6] == []


def test_broker_refuses_corrupt_batch(broker):
    """A produce carrying a CRC-broken batch is acked with
    CORRUPT_MESSAGE (2) and NOT appended to the log — matching real
    broker behavior for record-set validation."""
    _, addr = broker
    batch = bytearray(KW.encode_record_batch([(b"k", b"v")]))
    batch[-1] ^= 0xFF
    with _connect(addr) as sock:
        presp = KW.call(
            sock,
            KW.frame_request(
                KW.API_PRODUCE, 3, 5, KW.produce_request_v3("bad", 0, bytes(batch))
            ),
        )
        fresp = KW.call(
            sock, KW.frame_request(KW.API_FETCH, 4, 6, KW.fetch_request_v4("bad", 0))
        )
    # walk to the partition error code: ntopics, topic, nparts, partition, err
    (ntopics,) = struct.unpack(">i", presp[:4])
    assert ntopics == 1
    (tlen,) = struct.unpack(">h", presp[4:6])
    off = 6 + tlen + 4  # past topic string + nparts
    _partition, err = struct.unpack(">ih", presp[off : off + 6])
    assert err == 2  # CORRUPT_MESSAGE
    assert KW.parse_fetch_record_sets(fresp)[("bad", 0)] == b""


def test_unsupported_version_is_signalled(broker):
    _, addr = broker
    with _connect(addr) as sock:
        resp = KW.call(sock, KW.frame_request(KW.API_PRODUCE, 9, 7, b"\x00"))
    assert struct.unpack(">h", resp[:2])[0] == 35  # UNSUPPORTED_VERSION


def test_gzip_batch_roundtrip_and_attribute_bit():
    """Attribute-flagged gzip compression (RecordBatch v2 bits 0-2):
    encode/decode round-trips byte-identically to the uncompressed
    payload, the codec bit is actually set, the compressed batch is
    smaller on compressible data, and corruption inside the compressed
    section is caught by the CRC before any inflate runs."""
    import struct

    recs = [(f"k{i}".encode(), (f"v{i}-" * 40).encode()) for i in range(50)]
    plain = KW.encode_record_batch(recs)
    gz = KW.encode_record_batch(recs, codec=KW.CODEC_GZIP)
    (attrs_plain,) = struct.unpack(">h", plain[21:23])
    (attrs_gz,) = struct.unpack(">h", gz[21:23])
    assert attrs_plain & 0x07 == KW.CODEC_NONE
    assert attrs_gz & 0x07 == KW.CODEC_GZIP
    assert len(gz) < len(plain)
    assert KW.decode_record_batch(gz) == recs == KW.decode_record_batch(plain)
    # flip a byte in the compressed records section -> CRC catches it
    bad = bytearray(gz)
    bad[70] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        KW.decode_record_batch(bytes(bad))
    # a VALID CRC over a malformed gzip stream is refused as designed
    # (rebuild the crc over a corrupted payload; the flip sits in the
    # DEFLATE data past the 10-byte gzip header, not in mutable header
    # fields like mtime, so the stream is genuinely broken)
    body = bytearray(gz[21:])
    body[40 + 20] ^= 0xFF
    crc = KW.crc32c(bytes(body))
    forged = gz[:12] + struct.pack(">ibI", -1, 2, crc) + bytes(body)
    with pytest.raises(ValueError, match="gzip|CRC"):
        KW.decode_record_batch(forged)


def test_unknown_codec_bits_refused():
    import struct

    recs = [(b"k", b"v")]
    plain = KW.encode_record_batch(recs)
    body = bytearray(plain[21:])
    # codec bits 5-7 are unassigned in the Kafka protocol (0-4 are all
    # implemented as of round 11: none/gzip/snappy/lz4/zstd)
    attrs = struct.unpack(">h", body[:2])[0] | 5
    body[:2] = struct.pack(">h", attrs)
    crc = KW.crc32c(bytes(body))
    forged = plain[:12] + struct.pack(">ibI", -1, 2, crc) + bytes(body)
    with pytest.raises(ValueError, match="unsupported codec"):
        KW.decode_record_batch(forged)
    with pytest.raises(ValueError, match="unsupported codec"):
        KW.encode_record_batch(recs, codec=5)


def test_gzip_batches_through_broker(broker):
    """Mixed-codec log through produce -> socket -> fetch: the broker
    stores and serves gzip batches byte-identically and the decoded
    stream interleaves with uncompressed batches."""
    import socket
    import struct

    _, addr = broker
    b1 = KW.encode_record_batch([(b"a", b"1")], codec=KW.CODEC_GZIP)
    b2 = KW.encode_record_batch([(b"b", b"2")])
    with _connect(addr) as sock:
        for corr, batch in ((1, b1), (2, b2)):
            KW.call(
                sock,
                KW.frame_request(
                    KW.API_PRODUCE, 3, corr,
                    KW.produce_request_v3("t", 0, batch),
                ),
            )
        resp = KW.call(
            sock,
            KW.frame_request(
                KW.API_FETCH, 4, 3, KW.fetch_request_v4("t", 0, offset=0)
            ),
        )
    record_set = KW.parse_fetch_record_sets(resp)[("t", 0)]
    got = []
    for b in KW.split_record_sets(record_set):
        got.extend(KW.decode_record_batch(b))
    assert got == [(b"a", b"1"), (b"b", b"2")]


# --------------------------------------- KIP-98 idempotent producer


def _produce_one(sock, corr, topic, part, batch):
    resp = KW.call(
        sock,
        KW.frame_request(
            KW.API_PRODUCE, 3, corr, KW.produce_request_v3(topic, part, batch)
        ),
    )
    (tlen,) = struct.unpack(">h", resp[4:6])
    pos = 6 + tlen + 4
    _partition, err, offset, _ts = struct.unpack(">ihqq", resp[pos : pos + 22])
    return err, offset


def _fetch_all(sock, corr, topic, part):
    fresp = KW.call(
        sock,
        KW.frame_request(KW.API_FETCH, 4, corr, KW.fetch_request_v4(topic, part)),
    )
    sets = KW.parse_fetch_record_sets(fresp)
    return [
        rec
        for b in KW.split_record_sets(sets.get((topic, part), b""))
        for rec in KW.decode_record_batch(b)
    ]


def test_idempotent_replay_is_deduplicated(broker):
    """The KIP-98 exactly-once produce: a REPLAYED batch (same PID,
    epoch, baseSequence — the retry case the reference sidesteps with
    retries=0) is acked with its ORIGINAL offset and appended nothing;
    the log serves each record once."""
    _, addr = broker
    recs1 = [(b"k1", b"v1"), (b"k2", b"v2")]
    recs2 = [(b"k3", b"v3")]
    with _connect(addr) as sock:
        pid, epoch = KW.init_producer_id(sock)
        b1 = KW.encode_record_batch(
            recs1, producer_id=pid, producer_epoch=epoch, base_sequence=0
        )
        b2 = KW.encode_record_batch(
            recs2, producer_id=pid, producer_epoch=epoch, base_sequence=2
        )
        err, off1 = _produce_one(sock, 1, "t", 0, b1)
        assert (err, off1) == (0, 0)
        # the deliberate re-send: byte-identical replay of batch 1
        err, off_dup = _produce_one(sock, 2, "t", 0, b1)
        assert err == 0 and off_dup == off1  # silent dup, original offset
        err, off2 = _produce_one(sock, 3, "t", 0, b2)
        assert (err, off2) == (0, 2)
        # replay again AFTER later batches landed (still in dup cache)
        err, off_dup2 = _produce_one(sock, 4, "t", 0, b1)
        assert err == 0 and off_dup2 == 0
        got = _fetch_all(sock, 5, "t", 0)
    assert got == recs1 + recs2  # each record exactly once


def test_non_idempotent_replay_duplicates(broker):
    """WITHOUT the idempotence fields (pid −1, the legacy/default
    producer) the same replay DUPLICATES — the failure mode KIP-98
    exists for, and why the reference pinned retries=0."""
    _, addr = broker
    recs = [(b"k", b"v")]
    batch = KW.encode_record_batch(recs)  # pid/epoch/seq all -1
    with _connect(addr) as sock:
        assert _produce_one(sock, 1, "t", 0, batch) == (0, 0)
        err, off = _produce_one(sock, 2, "t", 0, batch)
        assert (err, off) == (0, 1)  # appended AGAIN
        got = _fetch_all(sock, 3, "t", 0)
    assert got == recs + recs  # duplicated


def test_sequence_gap_refused(broker):
    """A sequence gap (lost batch under max.in.flight) must be
    OUT_OF_ORDER_SEQUENCE_NUMBER, not a silent hole."""
    _, addr = broker
    with _connect(addr) as sock:
        pid, epoch = KW.init_producer_id(sock)
        b0 = KW.encode_record_batch(
            [(b"a", b"1")], producer_id=pid, producer_epoch=epoch, base_sequence=0
        )
        b_gap = KW.encode_record_batch(
            [(b"b", b"2")], producer_id=pid, producer_epoch=epoch, base_sequence=5
        )
        assert _produce_one(sock, 1, "t", 0, b0)[0] == 0
        err, _ = _produce_one(sock, 2, "t", 0, b_gap)
        assert err == KW.ERR_OUT_OF_ORDER_SEQUENCE
        # and nothing landed from the refused batch
        assert _fetch_all(sock, 3, "t", 0) == [(b"a", b"1")]


def test_stale_epoch_fenced_and_bump_resets_sequence(broker):
    """A batch from an OLDER epoch is fenced (INVALID_PRODUCER_EPOCH);
    a NEWER epoch resets the expected sequence to 0 — the public
    fencing rules."""
    _, addr = broker
    with _connect(addr) as sock:
        pid, epoch = KW.init_producer_id(sock)
        b0 = KW.encode_record_batch(
            [(b"a", b"1")], producer_id=pid, producer_epoch=epoch + 1,
            base_sequence=0,
        )
        assert _produce_one(sock, 1, "t", 0, b0)[0] == 0
        stale = KW.encode_record_batch(
            [(b"b", b"2")], producer_id=pid, producer_epoch=epoch,
            base_sequence=1,
        )
        err, _ = _produce_one(sock, 2, "t", 0, stale)
        assert err == KW.ERR_INVALID_PRODUCER_EPOCH
        bumped = KW.encode_record_batch(
            [(b"c", b"3")], producer_id=pid, producer_epoch=epoch + 2,
            base_sequence=0,  # bump resets to 0
        )
        assert _produce_one(sock, 3, "t", 0, bumped)[0] == 0
        assert _fetch_all(sock, 4, "t", 0) == [(b"a", b"1"), (b"c", b"3")]


def test_init_producer_id_assigns_unique_pids(broker):
    _, addr = broker
    with _connect(addr) as sock:
        pids = {KW.init_producer_id(sock, i)[0] for i in range(4)}
    assert len(pids) == 4


# ------------------------------- streaming crash recovery (S9 × S3)


def test_stream_checkpoint_recovery_exactly_once(spark, tmp_path, broker):
    """VERDICT r9 ask #7: kill the kafka_wire stream after draining,
    append NEW records to the broker (including to already-consumed
    partitions — the case the old partition-index cursor lost),
    restart from the SAME checkpoint: the restored aggregate counts
    every record exactly once (re-reading from 0 would double-count;
    a high-watermark restore would drop the appends), and an idle
    third run changes nothing."""
    import uuid

    from pyspark.sql import functions as F

    from real_time_big_data_analytics_spark.sources.pyds import (
        _repo_root,
        make_kafka_wire_stream_datasource,
    )

    _, addr = broker
    topic, nparts = "rec", 2
    produced = [0]

    def produce(part, n):
        recs = [
            (str(produced[0] + i).encode(), str(produced[0] + i).encode())
            for i in range(n)
        ]
        produced[0] += n
        with _connect(addr) as sock:
            batch = KW.encode_record_batch(recs)
            err, _ = _produce_one(sock, 1, topic, part, batch)
            assert err == 0

    ckpt = str(tmp_path / "ckpt")
    name = f"kwrec_{uuid.uuid4().hex[:8]}"
    spark.dataSource.register(make_kafka_wire_stream_datasource())

    def run_once():
        s = (
            spark.readStream.format("kafka_wire_stream")
            .option("addr", addr)
            .option("topic", topic)
            .option("nparts", str(nparts))
            .option("pkg", _repo_root())
            .load()
        )
        agg = s.groupBy("value").agg(F.count("*").alias("c"))
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        rows = spark.table(name).collect()
        # (total records counted, distinct values seen, max per-value
        # count — 1 proves no record was double-counted)
        return (
            sum(r["c"] for r in rows),
            len(rows),
            max(r["c"] for r in rows),
        )

    produce(0, 5)
    produce(1, 3)
    assert run_once() == (8, 8, 1)
    # "crash" happened (query stopped); appends land on BOTH a fresh
    # region of partition 1 and the already-consumed partition 0
    produce(0, 4)
    produce(1, 2)
    assert run_once() == (14, 14, 1)  # no dupes, no loss
    # third restart with one more record: state restored again, still
    # exactly-once (a from-zero re-read would double the first 14)
    produce(1, 1)
    assert run_once() == (15, 15, 1)


# --------------------------------------- KIP-98 transactions (EOS read)


def _fetch_resp(sock, corr, topic, part, isolation=KW.READ_UNCOMMITTED):
    resp = KW.call(
        sock,
        KW.frame_request(
            KW.API_FETCH, 4, corr,
            KW.fetch_request_v4(topic, part, isolation=isolation),
        ),
    )
    return KW.parse_fetch_response(resp)[(topic, part)]


def test_transactional_commit_abort_read_committed(broker):
    """Two transactions on one partition: A commits, B aborts. A
    read_committed consumer sees ONLY A's records (the abortedTxn list
    + marker walk drops B's; control batches are never delivered);
    read_uncommitted still surfaces B's data records."""
    _, addr = broker
    with _connect(addr) as sock:
        pa, ea = KW.init_producer_id(sock, 1)
        pb, eb = KW.init_producer_id(sock, 2)
        ba = KW.encode_record_batch(
            [(b"a1", b"good1"), (b"a2", b"good2")],
            producer_id=pa, producer_epoch=ea, base_sequence=0,
            transactional=True,
        )
        bb = KW.encode_record_batch(
            [(b"b1", b"poison")],
            producer_id=pb, producer_epoch=eb, base_sequence=0,
            transactional=True,
        )
        assert _produce_one(sock, 3, "t", 0, ba)[0] == 0
        assert _produce_one(sock, 4, "t", 0, bb)[0] == 0
        KW.end_txn(sock, "txA", pa, ea, commit=True, correlation_id=5)
        KW.end_txn(sock, "txB", pb, eb, commit=False, correlation_id=6)
        rc = _fetch_resp(sock, 7, "t", 0, isolation=KW.READ_COMMITTED)
        ru = _fetch_resp(sock, 8, "t", 0)
    # markers occupy offsets: 2 data + 1 poison + 2 markers = hw 5
    assert rc["high_watermark"] == 5 and rc["last_stable"] == 5
    assert rc["aborted"] == [(pb, 2)]
    got = KW.filter_read_committed(rc["record_set"], rc["aborted"])
    assert got == [(b"a1", b"good1"), (b"a2", b"good2")]
    # read_uncommitted surfaces the aborted DATA records (no filter),
    # and the raw set contains the two control batches
    raw = [
        rec
        for b in KW.split_record_sets(ru["record_set"])
        if not KW.batch_attributes(b) & KW.ATTR_CONTROL
        for rec in KW.decode_record_batch(b)
    ]
    assert (b"b1", b"poison") in raw
    ctrl = [
        b for b in KW.split_record_sets(ru["record_set"])
        if KW.batch_attributes(b) & KW.ATTR_CONTROL
    ]
    assert len(ctrl) == 2


def test_open_transaction_holds_lso(broker):
    """An UNFINISHED transaction pins the last-stable offset: a
    read_committed fetch serves nothing at/after its first offset
    (consumers cannot see data that might abort); commit releases it."""
    _, addr = broker
    with _connect(addr) as sock:
        # a committed plain record first
        assert _produce_one(
            sock, 1, "t", 0, KW.encode_record_batch([(b"k0", b"v0")])
        )[0] == 0
        pid, epoch = KW.init_producer_id(sock)
        open_b = KW.encode_record_batch(
            [(b"k1", b"v1")],
            producer_id=pid, producer_epoch=epoch, base_sequence=0,
            transactional=True,
        )
        assert _produce_one(sock, 2, "t", 0, open_b)[0] == 0
        rc = _fetch_resp(sock, 3, "t", 0, isolation=KW.READ_COMMITTED)
        assert rc["last_stable"] == 1 and rc["high_watermark"] == 2
        assert KW.filter_read_committed(
            rc["record_set"], rc["aborted"]
        ) == [(b"k0", b"v0")]
        ru = _fetch_resp(sock, 4, "t", 0)
        assert ru["last_stable"] == 1  # LSO reported either way
        raw = [
            rec
            for b in KW.split_record_sets(ru["record_set"])
            for rec in KW.decode_record_batch(b)
        ]
        assert (b"k1", b"v1") in raw  # read_uncommitted sees it
        KW.end_txn(sock, "tx", pid, epoch, commit=True, correlation_id=5)
        rc2 = _fetch_resp(sock, 6, "t", 0, isolation=KW.READ_COMMITTED)
        assert rc2["last_stable"] == 3  # marker took offset 2
        assert KW.filter_read_committed(
            rc2["record_set"], rc2["aborted"]
        ) == [(b"k0", b"v0"), (b"k1", b"v1")]


def test_abort_then_commit_same_pid_filters_only_aborted(broker):
    """One producer aborts its first transaction and commits its
    second: the consumer walk must drop exactly the first txn's
    records (the abort marker DEACTIVATES the pid before the second
    txn's batches arrive)."""
    _, addr = broker
    with _connect(addr) as sock:
        pid, epoch = KW.init_producer_id(sock)
        b1 = KW.encode_record_batch(
            [(b"x", b"aborted")],
            producer_id=pid, producer_epoch=epoch, base_sequence=0,
            transactional=True,
        )
        assert _produce_one(sock, 1, "t", 0, b1)[0] == 0
        KW.end_txn(sock, "tx", pid, epoch, commit=False, correlation_id=2)
        b2 = KW.encode_record_batch(
            [(b"y", b"kept")],
            producer_id=pid, producer_epoch=epoch, base_sequence=1,
            transactional=True,
        )
        assert _produce_one(sock, 3, "t", 0, b2)[0] == 0
        KW.end_txn(sock, "tx", pid, epoch, commit=True, correlation_id=4)
        rc = _fetch_resp(sock, 5, "t", 0, isolation=KW.READ_COMMITTED)
    assert rc["aborted"] == [(pid, 0)]
    assert KW.filter_read_committed(
        rc["record_set"], rc["aborted"]
    ) == [(b"y", b"kept")]


def test_spark_scan_isolation_levels_differ(spark, sf_dir):
    """Through the actual Spark datasource: read_committed equals the
    committed corpus exactly; read_uncommitted additionally surfaces
    the aborted poison duplicates AND the open transaction's rows —
    the staged adversaries are really on the wire and really filtered
    by isolation, not by staging accident."""
    from pyspark.sql import functions as F

    from real_time_big_data_analytics_spark.sources.pyds import (
        read_events_via_kafka_wire_transactional,
    )
    from real_time_big_data_analytics_spark.sources.tables import load_table

    rc = read_events_via_kafka_wire_transactional(
        spark, sf_dir, isolation="read_committed"
    )
    ru = read_events_via_kafka_wire_transactional(
        spark, sf_dir, isolation="read_uncommitted"
    )
    n_events = load_table(spark, sf_dir, "events").count()
    n_rc, n_ru = rc.count(), ru.count()
    assert n_rc == n_events
    assert n_ru > n_rc  # poison + open rows visible without isolation
    # the open transaction's sentinel rows exist ONLY uncommitted
    assert ru.filter(F.col("key") == "open").count() == 8
    assert rc.filter(F.col("key") == "open").count() == 0


def test_parse_produce_response_reads_error_at_correct_offset(broker):
    """ADVICE r10: the staging paths used to read the error int16 at
    ``10 + len(topic)`` — the top half of the partition int32, always
    0 — so broker refusals were silently swallowed. Pin the shared
    parser against the broker for BOTH a success and a refusal, and
    against this file's independent struct parse."""
    _, addr = broker
    with _connect(addr) as sock:
        pid, epoch = KW.init_producer_id(sock)
        ok = KW.encode_record_batch(
            [(b"a", b"1")], producer_id=pid, producer_epoch=epoch,
            base_sequence=0,
        )
        resp = KW.call(
            sock,
            KW.frame_request(
                KW.API_PRODUCE, 3, 1, KW.produce_request_v3("tp", 0, ok)
            ),
        )
        assert KW.parse_produce_response(resp) == (0, 0)
        gap = KW.encode_record_batch(
            [(b"b", b"2")], producer_id=pid, producer_epoch=epoch,
            base_sequence=9,
        )
        resp = KW.call(
            sock,
            KW.frame_request(
                KW.API_PRODUCE, 3, 2, KW.produce_request_v3("tp", 0, gap)
            ),
        )
        err, _off = KW.parse_produce_response(resp)
        assert err == KW.ERR_OUT_OF_ORDER_SEQUENCE  # NOT 0
        # agrees with the independent parse _produce_one has always used
        (tlen,) = struct.unpack(">h", resp[4:6])
        pos = 6 + tlen + 4
        _p, err2, off2, _ts = struct.unpack(">ihqq", resp[pos : pos + 22])
        assert (err, _off) == (err2, off2)


def test_snappy_batch_roundtrip_and_bare_raw_accepted(broker):
    """Round 11: attributes codec bits = 2 (snappy). The encoder
    writes the xerial stream (the Java client's shape); the decoder
    must take BOTH that and a bare raw-snappy payload (librdkafka's
    shape) — built here by hand-swapping the payload while recomputing
    the CRC, exactly what a foreign producer would send."""
    from real_time_big_data_analytics_spark.sources import snappy_codec as SN

    recs = [(f"k{i}".encode(), (f'{{"v":{i}}}' * 3).encode()) for i in range(500)]
    batch = KW.encode_record_batch(recs, codec=KW.CODEC_SNAPPY)
    assert KW.decode_record_batch(batch) == recs
    # wire trip through the broker preserves it
    _, addr = broker
    with _connect(addr) as sock:
        err, _ = _produce_one(sock, 1, "sn", 0, batch)
        assert err == 0
        assert _fetch_all(sock, 2, "sn", 0) == recs
    # bare raw-snappy payload (no xerial magic): rebuild the batch
    plain = KW.encode_record_batch(recs)  # codec none
    records_section = plain[61:]  # after the fixed 61-byte envelope
    raw_payload = SN.compress(records_section)
    attrs_codec = struct.pack(">h", KW.CODEC_SNAPPY)
    after_crc = attrs_codec + plain[23:61] + raw_payload
    crc = KW.crc32c(after_crc)
    tail = struct.pack(">ibI", -1, 2, crc) + after_crc
    bare = struct.pack(">qi", 0, len(tail)) + tail
    assert KW.decode_record_batch(bare) == recs


def test_group_offsets_survive_broker_restart(tmp_path):
    """Round 11: OffsetCommit durability — a NEW MiniBroker replaying
    the same data_dir serves the committed offset AND the log from
    disk; appends after restart continue the offset sequence."""
    d = str(tmp_path / "broker")
    recs = [(f"k{i}".encode(), f"v{i}".encode()) for i in range(7)]
    b1 = KW.MiniBroker(data_dir=d)
    addr = b1.start()
    with _connect(addr) as sock:
        host, port = addr.rsplit(":", 1)
        assert KW.find_coordinator(sock, "group") == (host, int(port))
        assert _produce_one(sock, 1, "t", 0, KW.encode_record_batch(recs)) == (0, 0)
        assert KW.offset_fetch(sock, "group", "t", [0]) == {0: -1}
        KW.offset_commit(sock, "group", "t", {0: 4})
    b1.stop()
    b2 = KW.MiniBroker(data_dir=d)
    addr2 = b2.start()
    try:
        with _connect(addr2) as sock:
            assert KW.offset_fetch(sock, "group", "t", [0]) == {0: 4}
            # a different group is independent and uncommitted
            assert KW.offset_fetch(sock, "g2", "t", [0]) == {0: -1}
            assert _fetch_all(sock, 1, "t", 0) == recs  # log replayed
            # append continues at offset 7, not 0
            err, off = _produce_one(
                sock, 2, "t", 0, KW.encode_record_batch([(b"x", b"y")])
            )
            assert (err, off) == (0, 7)
    finally:
        b2.stop()


def test_offset_commit_rewind_refused(broker):
    """A commit BEHIND the group's position is refused (the
    coordinator's zombie-consumer guard) — forward and equal commits
    are accepted."""
    _, addr = broker
    with _connect(addr) as sock:
        KW.offset_commit(sock, "grp_mono", "t", {0: 10})
        KW.offset_commit(sock, "grp_mono", "t", {0: 10})  # idempotent re-commit
        KW.offset_commit(sock, "grp_mono", "t", {0: 25})
        with pytest.raises(IOError, match="error 55"):
            KW.offset_commit(sock, "grp_mono", "t", {0: 24})
        assert KW.offset_fetch(sock, "grp_mono", "t", [0]) == {0: 25}


def test_fetch_from_committed_offset_resumes_exactly(broker):
    """The consume-commit-resume loop at wire level: batch-granular
    fetch from the committed offset serves the remainder exactly once
    when commits land on batch boundaries."""
    _, addr = broker
    topic = "t_resume"
    b1 = [(b"a", b"1"), (b"b", b"2")]
    b2 = [(b"c", b"3"), (b"d", b"4"), (b"e", b"5")]
    with _connect(addr) as sock:
        assert _produce_one(sock, 1, topic, 0, KW.encode_record_batch(b1))[0] == 0
        assert _produce_one(sock, 2, topic, 0, KW.encode_record_batch(b2))[0] == 0
        # consumer 1 processes the first batch and commits its end
        got1 = _fetch_all(sock, 3, topic, 0)
        assert got1 == b1 + b2
        KW.offset_commit(sock, "group", topic, {0: 2})
        # consumer 2 (post-crash) resumes from OffsetFetch
        start = KW.offset_fetch(sock, "group", topic, [0])[0]
        assert start == 2
        fresp = KW.call(
            sock,
            KW.frame_request(
                KW.API_FETCH, 4, 4, KW.fetch_request_v4(topic, 0, start)
            ),
        )
        sets = KW.parse_fetch_record_sets(fresp)
        rest = [
            rec
            for b in KW.split_record_sets(sets[(topic, 0)])
            for rec in KW.decode_record_batch(b)
        ]
        assert rest == b2  # no b1 re-delivery, nothing lost


def test_lz4_zstd_batch_roundtrip_and_wire_trip(broker):
    """Round 11: attribute codecs 3 (KIP-57 LZ4 frame) and 4 (zstd
    frame) — payload magic pinned to the public frame formats, full
    encode → broker → fetch → decode trip, and corruption surfacing
    as the designed ValueError class."""
    recs = [(f"k{i}".encode(), (f'{{"v":{i}}}' * 2).encode()) for i in range(400)]
    _, addr = broker
    for codec, magic, topic in (
        (KW.CODEC_LZ4, bytes.fromhex("04224d18"), "lz"),
        (KW.CODEC_ZSTD, bytes.fromhex("28b52ffd"), "zs"),
    ):
        batch = KW.encode_record_batch(recs, codec=codec)
        # the compressed payload starts after the 61-byte envelope
        assert batch[61 : 61 + 4] == magic
        assert KW.decode_record_batch(batch) == recs
        with _connect(addr) as sock:
            err, _ = _produce_one(sock, 1, topic, 0, batch)
            assert err == 0
            assert _fetch_all(sock, 2, topic, 0) == recs
        # corrupt INSIDE the frame with a recomputed CRC: the codec
        # itself must refuse (not just the CRC envelope)
        body = bytearray(batch[21:])
        body[60] ^= 0xFF  # a frame byte past the 40-byte batch header
        crc = KW.crc32c(bytes(body))
        tail = struct.pack(">ibI", -1, 2, crc) + bytes(body)
        bad = struct.pack(">qi", 0, len(tail)) + tail
        with pytest.raises(ValueError):
            KW.decode_record_batch(bad)


def test_list_offsets_earliest_latest_and_timestamp(broker):
    """Round 11: ListOffsets v1 — earliest/latest resolve from the
    offset index; a timestamp lookup walks the batch-header
    maxTimestamp fields (no record decode) and returns the first
    offset whose batch could hold a record at/after T."""
    _, addr = broker
    topic = "t_lo"
    with _connect(addr) as sock:
        assert KW.list_offsets(sock, topic, 0, KW.TS_EARLIEST) == 0
        assert KW.list_offsets(sock, topic, 0, KW.TS_LATEST) == 0
        b1 = KW.encode_record_batch([(b"a", b"1")], base_timestamp=1000)
        b2 = KW.encode_record_batch(
            [(b"b", b"2"), (b"c", b"3")], base_timestamp=2000
        )
        assert _produce_one(sock, 1, topic, 0, b1)[0] == 0
        assert _produce_one(sock, 2, topic, 0, b2)[0] == 0
        assert KW.list_offsets(sock, topic, 0, KW.TS_EARLIEST) == 0
        assert KW.list_offsets(sock, topic, 0, KW.TS_LATEST) == 3
        assert KW.list_offsets(sock, topic, 0, 500) == 0    # before all
        assert KW.list_offsets(sock, topic, 0, 1500) == 1   # second batch
        assert KW.list_offsets(sock, topic, 0, 2000) == 1
        assert KW.list_offsets(sock, topic, 0, 9999) == 3   # after all
