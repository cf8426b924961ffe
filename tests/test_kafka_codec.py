"""Kafka payload codec (S2/S3) + foreachBatch index sink (T2/S7)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from real_time_big_data_analytics_spark.sources import kafka
from real_time_big_data_analytics_spark.sources.tables import load_table
from real_time_big_data_analytics_spark.streaming.runner import (
    events_stream,
    index_sink,
    run_foreach_batch,
)

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def test_payload_roundtrip_lossless(spark, sf_dir):
    """encode → decode recovers every field, including comma-bearing
    strings (the reference's CSV corruption case, SURVEY.md §1.4.1)."""
    events = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", F.concat_ws(", ", "event_type", F.lit("x")).alias("event_type"), "value")
        .limit(100)
    )
    schema = "event_id bigint, user_id bigint, event_type string, value double"
    back = kafka.decode_payload(kafka.encode_payload(events, key_col="user_id"), schema)
    assert sorted(back.collect()) == sorted(events.collect())
    assert all("," in r.event_type for r in back.collect())


def test_encode_key_partitions_by_entity(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").limit(10)
    enc = kafka.encode_payload(events, key_col="user_id")
    assert enc.columns == ["key", "value"]
    keys = {r.key for r in enc.collect()}
    assert len(keys) > 1  # not the reference's constant key (§1.4.2)


# The exact DataFrame schema Spark's kafka source produces (Structured
# Streaming + Kafka Integration Guide, "Each row in the source has the
# following schema"). A live broker is unavailable in this sandbox, so
# the contract is pinned from the other side: a literal DataFrame with
# these columns must decode through the same decode_payload call a real
# topic would flow through.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def test_decode_from_kafka_wire_schema(spark, sf_dir):
    """encode → wrap in the kafka-source wire schema (binary key/value
    + transport metadata, exactly what `.format("kafka").load()`
    yields) → decode recovers every typed field. Pins that
    decode_payload's value-cast works on BINARY (the real source type,
    not the string the pure-codec test uses) and that the wire column
    names/types match the integration-guide contract, so pointing
    kafka_stream at a live topic exercises no untested column path."""
    events = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(50)
    )
    enc = kafka.encode_payload(events, key_col="user_id")
    wire = spark.createDataFrame(
        [
            (
                r.key.encode(),
                r.value.encode(),
                "events",
                int(r.key) % 4,   # entity-keyed partition, not constant
                i,
                None,
                0,
            )
            for i, r in enumerate(enc.collect())
        ],
        KAFKA_WIRE_SCHEMA,
    )
    # the wire frame is what a real source hands decode_payload
    assert wire.schema.simpleString() == (
        "struct<key:binary,value:binary,topic:string,partition:int,"
        "offset:bigint,timestamp:timestamp,timestampType:int>"
    )
    back = kafka.decode_payload(wire, SCHEMA)
    assert sorted(back.collect()) == sorted(events.collect())
    # keys survive the binary roundtrip and stay entity-distributed
    n_parts = wire.select("partition").distinct().count()
    assert n_parts > 1


def test_streaming_consumer_topology_over_wire_schema(spark, sf_dir):
    """The full consumer topology IN STREAMING MODE minus transport:
    wire-schema rows (binary key/value + kafka transport metadata)
    arrive through an unbounded source, flow through the same
    decode_payload a live ``kafka_stream`` uses, aggregate per
    event_type, and finish through an availableNow memory sink. Pins
    that the decode path is legal inside a streaming plan (from_json
    on binary under micro-batch execution), so a live topic swap
    changes only the ``.format("kafka")`` transport line."""
    from real_time_big_data_analytics_spark.streaming.runner import run_to_table

    events = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(200)
    )
    enc = kafka.encode_payload(events, key_col="user_id")
    wire = enc.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        (F.crc32(F.col("key")) % 4).cast("int").alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    with tempfile.TemporaryDirectory(prefix="rtba_wire_") as d:
        staged = os.path.join(d, "topic")
        wire.write.parquet(staged)
        stream = spark.readStream.schema(
            "key binary, value binary, topic string, partition int, "
            "offset bigint, timestamp timestamp, timestampType int"
        ).parquet(staged)
        assert stream.isStreaming
        decoded = kafka.decode_payload(stream, SCHEMA)
        agg = decoded.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum("value").alias("total")
        )
        got = {
            r.event_type: (r.n, round(r.total, 6))
            for r in run_to_table(spark, agg, output_mode="complete").collect()
        }
    want = {
        r.event_type: (r.n, round(r.total, 6))
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_foreach_batch_index_sink(spark, sf_dir):
    """availableNow replay through foreachBatch appends every event to
    the parquet 'index' exactly once (S7 stand-in)."""
    stream = events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    with tempfile.TemporaryDirectory(prefix="rtba_index_") as d:
        path = os.path.join(d, "index")
        run_foreach_batch(stream, index_sink(path), output_mode="append")
        indexed = spark.read.parquet(path)
        n_events = load_table(spark, sf_dir, "events").count()
        assert indexed.count() == n_events
        assert indexed.select("event_id").distinct().count() == n_events
        assert "_batch_id" in indexed.columns
