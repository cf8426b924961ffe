"""PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference (ntomazin/real-time-big-data-analytics — a DStream/RDD
Twitter bot-detection pipeline, see SURVEY.md), rebuilt idiomatically
on Spark Structured Streaming + DataFrames + Catalyst, and extended
with LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout:
  session     — SparkSession factory (AQE on, UTC, tuned shuffle)
  sources     — batch parquet/CSV readers + streaming file-replay sources
  operators   — batch operators (aggregations, joins, topk, dedup,
                similarity, text, relational, ml, multimodal)
  functions   — reusable Column-expression builders (array math, text)
  streaming   — Structured Streaming queries (windows, sessions, dedup,
                stream-static joins) run via availableNow for testability
  plans       — plan-inspection helpers (pushdown/broadcast assertions)
  registry    — the queries()/oracle_sql() contract for the harness
"""

__version__ = "0.1.0"
