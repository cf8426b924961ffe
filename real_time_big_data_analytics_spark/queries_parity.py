"""Registrations: P-series reference-parity codec/scoring ops (SURVEY.md §2.2)."""

from __future__ import annotations

from .operators import ml, parity
from .registry import register

register(
    "p_csv_parse_pipeline",
    parity.csv_parse_pipeline,
    sql=parity.CSV_PARSE_PIPELINE_SQL,
    tags=("parity", "csv"),
)

register(
    "p_json_roundtrip",
    parity.json_roundtrip_analytics,
    sql=parity.JSON_ROUNDTRIP_SQL,
    tags=("parity", "json"),
)

# HASH-EXACT since round 8 (VERDICT r7 ask #2a): the seeded tree fit
# over the FIXED sub-10k-row fixture is partitioning-independent, so
# its compiled CASE-WHEN (ml.P6_TREE_PREDICT_SQL, pinned + drift-
# asserted at query time and in tests/test_parity.py) lets DuckDB
# replay the exact MLlib scoring and verdict strings per user.
def _p6_sql(keyed: bool) -> str:
    """The P6 oracle; ``keyed`` adds the user_id row key (the column
    the ES verdict index transports as ``_id``)."""
    key = "f.user_id,\n       " if keyed else ""
    return f"""
WITH feats AS (
  SELECT user_id,
         count(*) AS n_events,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signups,
         round(avg(value), 2) AS avg_value,
         round(sum(value), 2) AS total_value
  FROM events GROUP BY user_id
), dim AS (
  SELECT c_custkey AS user_id,
         CAST(c_acctbal < 0 AS INT) AS protected,
         CAST(c_acctbal > 5000 AS INT) AS verified,
         lower(substr(c_mktsegment, 1, 2)) AS lang,
         n_name AS location
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT {key}f.n_events AS statuses_count,
       f.n_clicks AS followers_count,
       f.n_purchases AS friends_count,
       f.n_signups AS favourites_count,
       d.protected, d.verified, d.lang, d.location,
       CASE WHEN ({ml.P6_TREE_PREDICT_SQL}) = 0
            THEN 'Not bolt' ELSE 'Bolt' END AS bolt_user
FROM feats f JOIN dim d USING (user_id)
"""


register(
    "p6_scored_parity_9col",
    parity.scored_parity_9col,
    sql=_p6_sql(keyed=False),
    tags=("parity", "ml"),
)

# The reference's COMPLETE sink topology (round 8): score with the
# MLlib tree, bulk-index the verdicts into the reference's own
# detect_bolt_user index over the ES wire, read back via sliced
# scroll, hash every row (user_id decoded from the transported _id).
register(
    "s_es_verdict_index",
    parity.es_verdict_index_roundtrip,
    sql=_p6_sql(keyed=True),
    tags=("parity", "ml", "elasticsearch", "wire"),
)
