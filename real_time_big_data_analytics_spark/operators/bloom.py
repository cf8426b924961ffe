"""Broadcast Bloom-filter semi-join pruning (runtime filter, audited).

At 100 TB the dominant cost of a selective dim→fact semi join is
moving the fact table: even when the dim side broadcasts, every fact
row still reaches the join operator, and when neither side broadcasts
the fact table shuffles in full. Spark's own runtime filtering
(``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``) injects a
Bloom filter built from the dim side into the fact scan so
non-matching rows die at the source. The reference has no analogue —
its only join surface is the driver-side lookup in
ConsumerESFinal.scala — so this operator makes the pattern explicit
and AUDITABLE as data:

- **Build**: hash each qualifying dim key with ``K_HASHES``
  independent xxhash64 streams into an ``M_BITS``-wide bit array,
  materialized as ONE row holding a word→mask map (≤ ``M_BITS/64``
  entries — filter size is O(m) regardless of build-side row count,
  the property that makes it broadcastable at any scale).
- **Probe**: each fact row tests its K bit positions with O(1)
  ``element_at`` + bitwise AND — pure JVM column expressions, no UDF,
  no shuffle added.
- **Audit**: the same plan joins the exact key set and proves the two
  Bloom guarantees per group: ZERO false negatives (a Bloom filter
  may only over-approximate) and an observed false-positive rate
  within ``FPP_BOUND``.

The output contains only exactly-derivable values (per-type totals,
exact semi-join matches) plus the asserted booleans, so the DuckDB
twin — the plain exact semi join with constant-true flags — hash
matches iff the filter honours both guarantees.

Sizing note for real deployments: fpp ≈ (1 − e^(−kn/m))^k. With
m = 65536 and k = 4 the filter stays under FPP_BOUND = 1% up to
n ≈ 13k build keys; size m ≈ 16·n (next power of two) to hold ~0.2%
at arbitrary n. m is a compile-time constant here because the probe
expression bakes it in; a production wrapper would pick m from the
build side's countApprox first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

M_BITS = 1 << 16
K_HASHES = 4
FPP_BOUND = 0.01
SEGMENT = "BUILDING"


def _positions(key: Column) -> list[Column]:
    """K deterministic bit positions for a key: independent hash
    streams come from tupling the key with the stream index (xxhash64
    has a fixed seed in the DataFrame API; hashing (key, i) is the
    standard way to derive a family)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(M_BITS)).alias(f"pos_{i}")
        for i in range(K_HASHES)
    ]


def bloom_semijoin_prune_audit(
    spark: SparkSession, sf_dir: str, segment: str = SEGMENT
) -> DataFrame:
    """dq — build a Bloom filter over BUILDING-segment customer keys,
    probe every event, and certify no-false-negative + fpp-bound per
    event type alongside the exact semi-join counts."""
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")

    keys = (
        customer.where(F.col("c_mktsegment") == segment)
        .select(F.col("c_custkey").alias("user_id"))
        .distinct()
    )

    # Build: explode each key's K positions, OR the per-word masks,
    # collapse to a single map row. shiftleft-by-column needs the SQL
    # form (the Python wrapper only takes a literal shift).
    words = (
        keys.select(F.explode(F.array(*_positions(F.col("user_id")))).alias("pos"))
        .groupBy(F.floor(F.col("pos") / 64).alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))")
            ).alias("mask")
        )
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "mask"))).alias("bmap")
    )  # 1 row, ≤ M_BITS/64 entries — broadcast metadata, not data

    probed = events.crossJoin(F.broadcast(bloom)).select(
        "event_type", "user_id", *_positions(F.col("user_id")), "bmap"
    )
    hit = [
        (
            F.coalesce(
                F.element_at("bmap", F.floor(F.col(f"pos_{i}") / 64)), F.lit(0)
            ).bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos_{i}, 64) AS INT))")
            )
            != 0
        )
        for i in range(K_HASHES)
    ]
    bloom_pass = hit[0]
    for h in hit[1:]:
        bloom_pass = bloom_pass & h

    flagged = (
        probed.withColumn("bloom_pass", bloom_pass)
        .drop("bmap", *[f"pos_{i}" for i in range(K_HASHES)])
        .join(F.broadcast(keys.withColumn("exact", F.lit(True))), "user_id", "left")
        .withColumn("exact", F.coalesce(F.col("exact"), F.lit(False)))
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("exact").cast("long")).alias("n_true"),
            # guarantee 1: every true member passes the filter
            (
                F.sum((F.col("exact") & ~F.col("bloom_pass")).cast("long")) == 0
            ).alias("no_false_negatives"),
            # guarantee 2: observed fpp among true negatives ≤ bound
            (
                F.coalesce(
                    F.sum((F.col("bloom_pass") & ~F.col("exact")).cast("long"))
                    / F.sum((~F.col("exact")).cast("long")),
                    F.lit(0.0),
                )
                <= FPP_BOUND
            ).alias("fpp_ok"),
        )
        .orderBy("event_type")
    )


BLOOM_SEMIJOIN_SQL = f"""
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN k.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_true,
       true AS no_false_negatives,
       true AS fpp_ok
FROM events e
LEFT JOIN (SELECT DISTINCT c_custkey AS user_id FROM customer
           WHERE c_mktsegment = '{SEGMENT}') k
  ON e.user_id = k.user_id
GROUP BY e.event_type
ORDER BY e.event_type
"""
