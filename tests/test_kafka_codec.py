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
