"""File sources: schema'd CSV/JSON round trips (SURVEY.md §2.1 S4/S5)."""

from __future__ import annotations

import tempfile

from real_time_big_data_analytics_spark.sources import files

SCHEMA = "id bigint, name string, score double"
ROWS = [(1, "plain", 1.5), (2, "with, comma", -2.0), (3, None, 0.25)]


def _roundtrip(spark, write, read):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with tempfile.TemporaryDirectory(prefix="rtba_files_") as d:
        write(df, d)
        back = read(spark, d, SCHEMA)
        assert sorted(back.collect()) == sorted(df.collect())


def test_csv_roundtrip_quotes_commas(spark):
    """CSV writer quotes the embedded comma — the field survives,
    unlike the reference's unquoted serializer (SURVEY.md §1.4.1)."""
    _roundtrip(spark, files.write_csv, files.read_csv)


def test_jsonl_roundtrip(spark):
    _roundtrip(spark, files.write_jsonl, files.read_jsonl)
