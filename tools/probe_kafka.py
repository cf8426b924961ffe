"""Probe: can the Spark Kafka connector path (S2/S3) run in this
sandbox AT ALL? (VERDICT r5 ask #6 — committed evidence for why the
live connector round-trip stays environment-blocked.)

Checks, in order of what a loopback round-trip would need:
1. spark-sql-kafka connector JAR on the classpath (ships separately
   from pyspark; requires network/ivy to fetch);
2. any Python Kafka client (kafka-python / confluent-kafka) that could
   stand in as the counterparty;
3. an actual ``spark.readStream.format("kafka")`` load attempt, with
   the exact failure recorded.

What IS verified in-sandbox instead: the wire level.
``sources/kafka_wire.py`` implements RecordBatch v2 (CRC32C, zigzag
varints) + Produce v3 / Fetch v4 framing from the public protocol
spec, and ``tests/test_kafka_wire.py`` round-trips the JSON payload
codec over a REAL loopback TCP socket against an in-process MiniBroker
— so every byte layer below the connector is exercised; only the
connector itself (a Scala artifact absent from the container) is not.

Usage: python tools/probe_kafka.py   (prints one JSON line)
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    result: dict = {}

    import pyspark

    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*.jar"))
    kafka_jars = [os.path.basename(j) for j in jars if "kafka" in j.lower()]
    result["pyspark_version"] = pyspark.__version__
    result["n_jars"] = len(jars)
    result["kafka_jars"] = kafka_jars

    result["python_clients"] = {
        name: importlib.util.find_spec(name) is not None
        for name in ("kafka", "confluent_kafka", "aiokafka")
    }

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", "127.0.0.1:1")
            .option("subscribe", "probe")
            .load()
        )
        result["format_kafka_load"] = "loaded (connector present)"
    except Exception as e:  # noqa: BLE001 - the error IS the probe result
        msg = str(e).splitlines()[0][:300]
        result["format_kafka_load"] = f"{type(e).__name__}: {msg}"
    finally:
        spark.stop()

    result["conclusion"] = (
        "connector absent" if not kafka_jars else "connector present"
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
