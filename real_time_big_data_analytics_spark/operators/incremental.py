"""Incremental-maintenance operators: CDC upsert (MERGE-style) and
SCD2 history build over the ``events`` changelog.

The reference pipeline is append-only (reference ProducerFinal.scala
streams records straight to a sink); a production lakehouse also
needs the *update* path: applying a batch of changes onto a standing
snapshot (MERGE INTO semantics) and keeping dimension history
(slowly-changing-dimension type 2).  Both are expressed as pure
DataFrame plans — window dedup + full-outer join — so they run
identically on a 1000-executor cluster: every shuffle is keyed by
``user_id`` and the join co-partitions with the two window passes.

At 100 TB the base side would be a bucketed table (bucket by
``user_id``) and only the delta would shuffle; the plan shape below
is unchanged by that — Catalyst drops the exchange on the bucketed
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

# Mid-range snapshot cut: events span 2024-01-01 .. 2024-01-30.
DEFAULT_CUTOFF = "2024-01-16 00:00:00"


def _latest_per_user(df: DataFrame) -> DataFrame:
    """Keep each user's most recent event (ts, then event_id ties)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def cdc_upsert_state(
    spark: SparkSession, sf_dir: str, cutoff: str = DEFAULT_CUTOFF
) -> DataFrame:
    """MERGE INTO pattern: apply a changelog delta onto a snapshot.

    Base = each user's latest event at/before ``cutoff``; delta =
    latest event after ``cutoff``.  The merge is a full-outer join on
    the key with ``coalesce`` column resolution — exactly what
    Delta/Iceberg MERGE compiles to when every source row is
    WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT.

    Both window passes and the join share the ``user_id`` hash
    partitioning; the ``updated`` flag records whether the delta
    replaced (or created) the row.
    """
    ev = load_table(spark, sf_dir, "events")
    base = _latest_per_user(ev.filter(F.col("ts") <= cutoff)).select(
        F.col("user_id").alias("b_user_id"),
        F.col("event_type").alias("b_type"),
        F.col("value").alias("b_value"),
        F.col("ts").alias("b_ts"),
    )
    delta = _latest_per_user(ev.filter(F.col("ts") > cutoff)).select(
        F.col("user_id").alias("d_user_id"),
        F.col("event_type").alias("d_type"),
        F.col("value").alias("d_value"),
        F.col("ts").alias("d_ts"),
    )
    return (
        base.join(delta, base.b_user_id == delta.d_user_id, "full_outer")
        .select(
            F.coalesce("b_user_id", "d_user_id").alias("user_id"),
            F.coalesce("d_type", "b_type").alias("state_event_type"),
            F.coalesce("d_value", "b_value").alias("state_value"),
            F.coalesce("d_ts", "b_ts").alias("state_ts"),
            F.col("d_user_id").isNotNull().alias("updated"),
        )
    )


def scd2_user_history(
    spark: SparkSession, sf_dir: str, user_mod: int = 20
) -> DataFrame:
    """SCD type-2 build: changelog rows → validity intervals.

    Each event becomes a dimension version valid from its own ``ts``
    until the user's next event (open-ended for the current row).
    One window shuffle on ``user_id``; the deterministic ``user_mod``
    sample bounds output size for the harness (at scale the operator
    runs unsampled — the sample is a plain pushed-down filter, not a
    structural change).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.filter(F.col("user_id") % user_mod == 0)
        .select(
            "user_id",
            "event_type",
            "value",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )
