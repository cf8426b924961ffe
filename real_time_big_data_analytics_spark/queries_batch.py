"""Registrations: batch analytics + relational core (SURVEY.md §2.2-2.7)."""

from __future__ import annotations

from .operators import aggregations as agg
from .registry import register

# --- A-series: the internalized Kibana analytics (SURVEY.md §2.3) ---

register(
    "a1_count_by_group",
    agg.count_by_group,
    sql="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    tags=("agg", "reference-K"),
)

register(
    "a3_sum_by_group",
    agg.sum_by_group,
    sql="""
    SELECT event_type,
           round(sum(value), 2) AS total_value,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("agg", "reference-K"),
)

_TOPK_OTHER_SQL = """
WITH counts AS (
  SELECT {term} AS t, count(*) AS n FROM documents GROUP BY {term}
), ranked AS (
  SELECT t, n, row_number() OVER (ORDER BY n DESC, t ASC) AS rk FROM counts
)
SELECT CASE WHEN rk <= {k} THEN t ELSE 'Other' END AS term,
       CAST(sum(n) AS BIGINT) AS n
FROM ranked GROUP BY 1
"""

register(
    "a2_topk_sources_other",
    agg.topk_sources_other,
    sql=_TOPK_OTHER_SQL.format(term="source", k=5),
    tags=("agg", "topk", "reference-K"),
)

register(
    "a4_topk_lang_other",
    agg.topk_lang_other,
    sql=_TOPK_OTHER_SQL.format(term="lang", k=3),
    tags=("agg", "topk", "reference-K"),
)

register(
    "a5_recent_window_counts",
    agg.recent_window_counts,
    sql="""
    WITH m AS (SELECT max(ts) AS max_ts FROM events)
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events, m
    WHERE ts >= max_ts - INTERVAL 15 MINUTE
    GROUP BY event_type
    """,
    tags=("agg", "time-filter", "reference-K"),
)

register(
    "a6_counts_over_time",
    agg.counts_over_time,
    sql="""
    SELECT date_trunc('hour', ts) AS window_start, count(*) AS n
    FROM events GROUP BY 1
    """,
    tags=("agg", "window", "reference-K"),
)

register(
    "flagship_windowed_analytics",
    agg.flagship_windowed_analytics,
    sql="""
    SELECT date_trunc('hour', ts) + (minute(ts) // 15) * (INTERVAL 15 MINUTE)
             AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "window", "flagship"),
)
