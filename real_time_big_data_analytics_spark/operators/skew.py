"""Skew-resilient aggregation (SURVEY.md §4.3; scale mandate).

The harness keys are well distributed, but at 100 TB real event
streams have power-law keys (one hot user/device/null-bucket can hold
a double-digit percentage of a day's rows), and a single reducer
partition becomes the straggler. Two mitigations, both demonstrated
here:

- **AQE skew-join splitting** is on in the session factory
  (session.py) and covers joins automatically.
- **Two-phase salted aggregation** covers groupBy: phase 1 aggregates
  on (key, salt) so a hot key's rows spread over ``n_salts``
  reducers; phase 2 combines the per-salt partials. For algebraic
  aggregates (count/sum/min/max) the result is identical to the
  direct groupBy — which is exactly what the DuckDB oracle twin
  checks.

The salt is derived from a uniform hash of the row's unique id —
deterministic, no RNG state, replay-safe in streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import round2
from ..sources.tables import load_table

N_SALTS = 8


def salted_user_stats(spark: SparkSession, sf_dir: str, n_salts: int = N_SALTS) -> DataFrame:
    """Two-phase salted per-user aggregate over events.

    Phase 1 shuffles on (user_id, salt) — a hot user occupies
    ``n_salts`` reducers instead of one; phase 2 shuffles the (tiny)
    per-salt partials on user_id. Algebraic combine keeps the result
    bit-equal to the unsalted groupBy.
    """
    events = load_table(spark, sf_dir, "events")
    salted = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts))
    )
    partial = salted.groupBy("user_id", "salt").agg(
        F.count("*").alias("c"),
        F.sum("value").alias("v"),
        F.max("value").alias("mx"),
    )
    return partial.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        round2(F.sum("v")).alias("total_value"),
        round2(F.max("mx")).alias("max_value"),
    )


SALTED_USER_STATS_SQL = """
SELECT user_id, count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       round(max(value), 2) AS max_value
FROM events GROUP BY user_id
"""


def salted_replicated_join(
    spark: SparkSession, sf_dir: str, n_salts: int = N_SALTS
) -> DataFrame:
    """Manual hot-key JOIN mitigation (the pre-AQE classic, still the
    tool when a key is too hot for AQE's split granularity or the
    build side must stay a shuffle join): salt the BIG side with a
    deterministic row-hash, REPLICATE the dimension side once per
    salt, and equi-join on (key, salt) — a hot key's probe rows land
    on ``n_salts`` reducers instead of one. Join multiplicity is
    unchanged (each big-side row matches exactly its own salt's
    replica), so the result is bit-equal to the plain join — which is
    exactly what the DuckDB twin (the UNSALTED join) checks.

    Cost: dimension shuffle volume × n_salts (dimension-sized, cheap);
    big-side volume unchanged. Demonstrated on events ⋈ customer with
    a per-segment rollup; the AQE automatic path stays documented in
    the module header.
    """
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    big = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts))
    )
    dim = customer.select("c_custkey", "c_mktsegment").withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    joined = big.join(
        dim,
        (big.user_id == dim.c_custkey) & (big.salt == dim.salt),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_events"),
        round2(F.sum("value")).alias("total_value"),
    )
