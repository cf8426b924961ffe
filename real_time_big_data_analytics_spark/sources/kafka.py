"""Kafka source/sink wiring (SURVEY.md §2.1 S2/S3).

The reference produces unquoted-CSV strings with a constant record key
(reference ProducerFinal.scala:78-79 — the §1.4.1/§1.4.2 bugs: commas
corrupt the parse, the constant key collapses all traffic onto one
partition) and consumes with a receiver-less direct stream (reference
ConsumerESFinal.scala:40-47).

This module is the structured equivalent:

- payloads are JSON (``to_json``/``from_json`` with an explicit
  schema) — embedded commas survive, fields are typed;
- the record key is a real column (e.g. ``user_id``) so the topic
  partitions by entity and consumer parallelism scales with the
  partition count;
- offsets live in the streaming checkpoint, not a consumer group
  (Structured Streaming semantics), giving exactly-once sinks with
  ``foreachBatch``/idempotent writers.

The payload codecs are pure column transforms, testable without a
broker (tests/test_kafka_codec.py); ``kafka_stream``/``write_kafka``
add only the transport options around them, so swapping the harness's
file replay (streaming/runner.py) for a live topic changes one call.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def encode_payload(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Typed columns → Kafka-shaped ``(key, value)`` strings (S2).

    ``value`` is the full row as JSON; ``key`` is the chosen column
    (entity-partitioned topic) or null (round-robin) — never the
    reference's constant ``"key"`` (§1.4.2).
    """
    key: Column = (
        F.col(key_col).cast("string") if key_col else F.lit(None).cast("string")
    )
    return df.select(
        key.alias("key"), F.to_json(F.struct(*df.columns)).alias("value")
    )


def decode_payload(raw: DataFrame, schema: StructType | str) -> DataFrame:
    """Kafka ``value`` bytes/strings → typed columns via ``from_json``
    (S3) — the schema'd replacement for ``split(",")`` positional
    parsing (reference ConsumerESFinal.scala:70-72)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")


def kafka_stream(
    spark: SparkSession,
    *,
    brokers: str,
    topic: str,
    schema: StructType | str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S3 — direct Kafka source as an unbounded typed DataFrame.

    Receiver-less by construction (each task reads its partition range;
    ``PreferConsistent`` locality is the default), offsets tracked in
    the query checkpoint.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_payload(raw, schema)


def write_kafka(
    df: DataFrame,
    *,
    brokers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = None,
):
    """S2 — Kafka sink for a streaming DataFrame. Producer pooling,
    batching, and retries are handled by the sink (the reference
    hand-built a producer per partition, ProducerFinal.scala:66-67).
    Returns the started StreamingQuery."""
    return (
        encode_payload(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
