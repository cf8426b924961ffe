"""Registrations: batch analytics + relational core (SURVEY.md §2.2-2.7)."""

from __future__ import annotations

from .operators import aggregations as agg
from .operators import joins, relational, udx
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

# --- J-series joins (SURVEY.md §2.4) ---

register(
    "j1_revenue_by_mktsegment",
    joins.revenue_by_mktsegment,
    sql="""
    SELECT c_mktsegment,
           round(sum(o_totalprice), 2) AS total_revenue,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join",),
)

register(
    "j2_revenue_by_nation_region",
    joins.revenue_by_nation_region,
    sql="""
    SELECT n_name, r_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
    tags=("join", "multiway"),
)

register(
    "j3_orders_per_customer",
    joins.orders_per_customer,
    sql="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join", "outer"),
)

register(
    "j3_semi_customers_with_urgent",
    joins.customers_with_orders_by_nation,
    sql="""
    SELECT c_nationkey, count(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
    tags=("join", "semi"),
)

register(
    "j3_anti_customers_without_urgent",
    joins.customers_without_urgent_orders,
    sql="""
    SELECT c_mktsegment, count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    tags=("join", "anti"),
)

register(
    "q3_top_orders_by_revenue",
    joins.top_orders_by_revenue,
    sql="""
    SELECT l_orderkey, o_orderdate,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    tags=("join", "topk", "tpch"),
)

# --- relational core (SURVEY.md §2.2, §2.5-2.7) ---

register(
    "q1_pricing_summary",
    relational.pricing_summary,
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 2) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
)

register(
    "sort_top_orders_by_price",
    relational.top_orders_by_price,
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    tags=("sort", "limit"),
)

register(
    "setop_union_priority_slices",
    relational.union_priority_slices,
    sql="""
    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 400000
    """,
    tags=("setop",),
)

register(
    "setop_intersect_customers",
    relational.intersect_customer_sets,
    sql="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    tags=("setop",),
)

register(
    "setop_except_customers",
    relational.except_customer_sets,
    sql="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("setop",),
)

register(
    "distinct_segments",
    relational.distinct_segments,
    sql="SELECT DISTINCT c_mktsegment FROM customer",
    tags=("setop",),
)

register(
    "wf_topk_events_per_type",
    relational.topk_events_per_type,
    sql="""
    SELECT event_type, event_id, value, rk FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id ASC) AS rk
      FROM events
    ) WHERE rk <= 3
    """,
    tags=("window-function",),
)

register(
    "wf_running_value_per_user",
    relational.running_value_per_user,
    sql="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running_value
    FROM events
    """,
    tags=("window-function",),
)

register(
    "wf_analytic_order_stats",
    relational.analytic_order_stats,
    sql="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 4) AS pct_rank,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(lag(o_totalprice) OVER w, 2) AS prev_price,
           round(avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS ma3
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window-function", "analytic"),
)

register(
    "wf_sessionize_events",
    relational.sessionize_events,
    sql="""
    WITH flagged AS (
      SELECT user_id,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                    OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), ids AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(max(session_id) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM ids GROUP BY user_id
    """,
    tags=("window-function", "sessionization"),
)

register(
    "pivot_event_counts",
    relational.pivot_event_counts,
    sql="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'view')     AS view,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
    tags=("pivot",),
)

register(
    "rollup_orders_by_year_month",
    relational.rollup_orders_by_year_month,
    sql="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           round(sum(o_totalprice), 2) AS total,
           count(*) AS n
    FROM orders GROUP BY ROLLUP (yr, mo)
    """,
    tags=("rollup",),
)

register(
    "sf_json_props_stats",
    relational.json_props_stats,
    sql="""
    SELECT event_type,
           CAST(sum(CAST(props ->> '$.k' AS INT)) AS BIGINT) AS sum_k,
           min(CAST(props ->> '$.k' AS INT)) AS min_k,
           max(CAST(props ->> '$.k' AS INT)) AS max_k
    FROM events GROUP BY event_type
    """,
    tags=("scalar", "json"),
)

register(
    "sf_orders_by_month",
    relational.orders_by_month,
    sql="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           round(sum(o_totalprice), 2) AS total,
           count(*) AS n
    FROM orders GROUP BY 1, 2
    """,
    tags=("scalar", "date"),
)

register(
    "sf_string_profile_by_lang",
    relational.string_profile_by_lang,
    sql="""
    SELECT upper(lang) AS lang_uc,
           count(*) AS n_docs,
           max(length(text)) AS max_len,
           min(length(text)) AS min_len,
           round(avg(n_chars), 2) AS avg_chars,
           count(DISTINCT source) AS n_sources
    FROM documents GROUP BY 1
    """,
    tags=("scalar", "string"),
)

register(
    "q6_forecast_revenue",
    relational.forecast_revenue,
    sql="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    tags=("agg", "tpch", "pushdown"),
)

register(
    "subquery_orders_above_avg",
    relational.orders_above_customer_avg,
    sql=relational.ORDERS_ABOVE_AVG_SQL,
    tags=("subquery", "sql-entry"),
)

from .operators import sketches, skew  # noqa: E402

register(
    "skew_salted_user_stats",
    skew.salted_user_stats,
    # the oracle is the UNSALTED aggregate — a hash match proves the
    # two-phase salted plan is result-identical
    sql=skew.SALTED_USER_STATS_SQL,
    tags=("agg", "skew", "salting"),
)

register(
    "skew_salted_replicated_join",
    skew.salted_replicated_join,
    # oracle = the plain UNSALTED join: hash match proves the
    # salt-and-replicate join preserves multiplicity exactly
    sql="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join", "skew", "salting"),
)

# Sketch estimates are estimator-specific, so each registers its
# bound-assertion twin (operators/sketches.py module docstring): the
# Spark plan computes estimate + exact together and asserts the error
# bound; the oracle emits the exact side with within_bound=true, so
# the hash matches iff the sketch meets its documented bound.
register(
    "sketch_distinct_users",
    sketches.distinct_users_checked,
    sql="""
    SELECT event_type, count(DISTINCT user_id) AS exact_users,
           true AS within_bound
    FROM events GROUP BY event_type
    """,
    tags=("sketch", "hll"),
)
register(
    "sketch_value_quantiles",
    sketches.value_quantiles_checked,
    sql="""
    SELECT event_type, count(*) AS n,
           true AS ok50, true AS ok95, true AS ok99
    FROM events GROUP BY event_type
    """,
    tags=("sketch", "quantile"),
)

register(
    "q14_promo_revenue",
    joins.promo_revenue_share,
    sql="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 2) AS promo_share_pct,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
    """,
    tags=("join", "tpch", "conditional-agg"),
)

register(
    "j5_supplier_nation_revenue",
    joins.supplier_nation_revenue,
    sql="""
    SELECT n_name AS supp_nation,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "supplier"),
)

register(
    "cube_orders_status_priority",
    relational.cube_orders_status_priority,
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 2) AS total, count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("cube", "grouping-sets"),
)

register(
    "asof_purchase_attribution",
    relational.asof_purchase_attribution,
    sql="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, ts,
             last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
               OVER w AS click_event_id,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER w AS click_ts
      FROM events
      WHERE event_type IN ('click', 'purchase')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_event_id, user_id, click_event_id,
           (epoch_us(ts) - epoch_us(click_ts)) // 1000000 AS gap_s
    FROM ev
    WHERE event_type = 'purchase' AND click_event_id IS NOT NULL
    """,
    tags=("join", "asof", "attribution"),
)

register(
    "sketch_frequent_words",
    sketches.frequent_words_checked,
    sql="""
    SELECT word, n AS exact_n, true AS within_bound FROM (
      SELECT word, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> ''
      GROUP BY word ORDER BY n DESC, word ASC LIMIT 10
    )
    """,
    tags=("sketch", "heavy-hitters"),
)

register(
    "sketch_theta_user_overlap",
    sketches.theta_overlap_checked,
    sql="""
    SELECT count(*) AS exact_both, true AS within_bound FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    tags=("sketch", "theta", "set-algebra"),
)

register(
    "u1_udaf_median_value",
    udx.median_value_by_event_type,
    sql="""
    SELECT event_type, round(median(value), 2) AS med_value, count(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("udf", "udaf", "pandas"),
)

register(
    "u3_maparrow_byte_profile",
    udx.arrow_byte_profile,
    # length() counts codepoints, octet_length(encode()) counts UTF-8
    # bytes — the same chars-vs-bytes split the Arrow kernels compute
    sql="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(sum(length(text) - length(replace(text, 'e', ''))) AS BIGINT)
             AS total_e
    FROM documents GROUP BY lang
    """,
    tags=("udf", "arrow", "map-in-arrow"),
)

register(
    "q7_volume_shipping",
    joins.volume_shipping,
    sql="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
    tags=("join", "tpch", "multiway"),
)

register(
    "q18_large_volume_orders",
    joins.large_volume_orders,
    sql="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "tpch", "subquery", "having"),
)

register(
    "q22_inactive_high_balance",
    joins.high_balance_inactive_customers,
    sql="""
    SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    """,
    tags=("join", "tpch", "subquery", "anti"),
)

register(
    "q5_local_supplier_volume",
    joins.local_supplier_volume,
    sql="""
    SELECT n_name, year(o_orderdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE s_nationkey = c_nationkey
    GROUP BY 1, 2
    """,
    tags=("join", "tpch", "multiway"),
)

register(
    "q10_returned_item_customers",
    joins.returned_item_customers,
    sql="""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "tpch", "topk"),
)

register(
    "q15_top_supplier",
    joins.top_supplier_by_revenue,
    sql="""
    WITH r AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM r JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM r)
    """,
    tags=("join", "tpch", "subquery", "view"),
)

register(
    "q8_national_market_share",
    joins.national_market_share,
    sql="""
    SELECT year(o_orderdate) AS o_year,
           round(sum(CASE WHEN n1.n_name = 'NATION_3'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share,
           count(*) AS n_items
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region   ON n2.n_regionkey = r_regionkey
    WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
    GROUP BY 1
    """,
    tags=("join", "tpch", "conditional-agg"),
)

register(
    "q19_disjunctive_revenue",
    joins.discounted_revenue_disjunctive,
    sql="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size <= 25 AND l_quantity BETWEEN 10 AND 30)
    """,
    tags=("join", "tpch", "pushdown", "disjunctive"),
)

register(
    "q4_late_shipment_priority",
    joins.late_shipment_priority_check,
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "tpch", "subquery"),
)

register(
    "q13_customer_distribution",
    joins.customer_order_distribution,
    sql="""
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count
    """,
    tags=("join", "tpch", "outer", "double-agg"),
)

register(
    "q17_small_quantity_revenue",
    joins.small_quantity_revenue,
    sql="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    """,
    tags=("join", "tpch", "correlated-subquery"),
)

register(
    "q9_product_profit",
    joins.product_profit_by_nation_year,
    sql="""
    SELECT n_name AS nation,
           year(o_orderdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_profit,
           count(*) AS n_items
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """,
    tags=("join", "tpch",),
)

register(
    "j6_range_join_price_tiers",
    joins.price_tier_range_join,
    sql="""
    SELECT tier, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    JOIN (VALUES ('small', 0.0, 1000.0),
                 ('medium', 1000.0, 5000.0),
                 ('large', 5000.0, 20000.0),
                 ('jumbo', 20000.0, 1e18)) AS t(tier, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY tier
    """,
    tags=("join", "range-join", "nonequi"),
)

register(
    "groupingsets_orders",
    relational.grouping_sets_orders,
    # both engines run the same GROUPING SETS text; only the final
    # rounding differs (round2 vs DuckDB round — tie semantics)
    sql=relational.GROUPING_SETS_ORACLE_SQL,
    tags=("agg", "grouping-sets", "sql-surface"),
)

register(
    "sf_exact_percentiles",
    relational.exact_percentiles_by_type,
    sql="""
    SELECT event_type,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 2) AS p50,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 2) AS p90,
           round(percentile_cont(0.99) WITHIN GROUP (ORDER BY value), 2) AS p99,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("agg", "percentile"),
)

register(
    "q16_supplier_part_segments",
    joins.supplier_count_by_part_attrs,
    sql="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
    GROUP BY p_brand, p_size
    """,
    tags=("join", "tpch", "distinct-agg"),
)

register(
    "sf_stats_moments",
    relational.stats_moments_by_type,
    sql="""
    SELECT event_type,
           round(stddev_samp(value), 4) AS sd_value,
           round(covar_samp(value, CAST(hour(ts) AS DOUBLE)), 4) AS covar_vh,
           round(corr(value, CAST(hour(ts) AS DOUBLE)), 4) AS corr_vh,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("agg", "statistics"),
)

register(
    "sf_value_histogram",
    relational.value_histogram,
    sql="""
    WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
    SELECT CAST(least(coalesce(floor((value - lo) / nullif((hi - lo) / 20, 0)), 0), 19)
                AS INT) AS bucket,
           count(*) AS n
    FROM events, b GROUP BY 1
    """,
    tags=("agg", "histogram"),
)

register(
    "q21_waiting_suppliers",
    joins.waiting_suppliers,
    sql="""
    WITH marked AS (
      SELECT l_orderkey, l_suppkey, l_shipdate,
             max(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship,
             count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supp
      FROM lineitem
    ), late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM marked WHERE n_supp > 1 AND l_shipdate = max_ship
    )
    SELECT s_name, n_name, numwait FROM (
      SELECT l_suppkey, count(*) AS numwait FROM late GROUP BY l_suppkey
    ) w
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    ORDER BY numwait DESC, s_name ASC, s_suppkey ASC
    LIMIT 20
    """,
    tags=("join", "tpch", "window"),
)

register(
    "wf_funnel_counts",
    relational.funnel_counts,
    sql="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
      GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT count(v.t1) AS n_viewed,
           count(c.t2) AS n_clicked,
           count(p.t3) AS n_purchased,
           round(avg((epoch_ms(c.t2) - epoch_ms(v.t1)) / 3600000.0), 4)
             AS avg_hours_view_to_click,
           round(avg((epoch_ms(p.t3) - epoch_ms(c.t2)) / 3600000.0), 4)
             AS avg_hours_click_to_purchase
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    """,
    tags=("agg", "funnel", "sequential"),
)

register(
    "wf_retention_cohorts",
    relational.retention_cohorts,
    sql="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), a AS (
      SELECT DISTINCT
             date_trunc('week', s.signup_ts) AS cohort_week,
             CAST(floor((epoch_ms(e.ts) - epoch_ms(s.signup_ts)) / 604800000.0)
                  AS BIGINT) AS week_offset,
             e.user_id
      FROM events e JOIN s ON e.user_id = s.user_id
    )
    SELECT cohort_week, week_offset, count(*) AS n_active
    FROM a WHERE week_offset >= 0 AND week_offset < 8
    GROUP BY cohort_week, week_offset
    """,
    tags=("agg", "cohort", "retention"),
)

register(
    "ts_gapfill_locf_hourly",
    relational.gapfill_locf_hourly,
    sql="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, count(*) AS n_raw, avg(value) AS avg_raw
      FROM events GROUP BY 1
    ), b AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
    )
    SELECT g.h,
           CAST(coalesce(n_raw, 0) AS BIGINT) AS n,
           round(last_value(avg_raw IGNORE NULLS)
                 OVER (ORDER BY g.h ROWS UNBOUNDED PRECEDING), 4)
             AS avg_value_locf
    FROM grid g LEFT JOIN hourly ON g.h = hourly.h
    """,
    tags=("agg", "time-series", "gapfill"),
)

register(
    "ts_rolling_zscore",
    relational.rolling_zscore_hourly,
    sql="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1
    )
    SELECT h, CAST(n AS BIGINT) AS n,
           round((n - avg(n) OVER w) / nullif(stddev_samp(n) OVER w, 0), 4) AS zscore
    FROM hourly
    WINDOW w AS (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    """,
    tags=("agg", "time-series", "anomaly"),
)

# --- round-3 additions: event-sequence analytics over the same
# (user_id, ts) window sort the session/funnel family uses ---

register(
    "wf_event_transitions",
    relational.event_transitions,
    sql="""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ), t AS (
      SELECT cur, nxt, count(*) AS n FROM seq WHERE nxt IS NOT NULL
      GROUP BY cur, nxt
    )
    SELECT cur AS cur_type, nxt AS next_type, n AS n_transitions,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur), 4) AS p_next
    FROM t
    """,
    tags=("window-function", "sequence", "markov"),
)

register(
    "wf_top_event_paths",
    relational.top_event_paths,
    sql="""
    WITH seq AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
      SELECT concat_ws(' > ', e1, e2, e3) AS path, count(*) AS n
      FROM seq WHERE e3 IS NOT NULL GROUP BY 1
    )
    SELECT path, n, CAST(rk AS BIGINT) AS rk
    FROM (SELECT path, n, row_number() OVER (ORDER BY n DESC, path ASC) AS rk
          FROM paths)
    WHERE rk <= 10
    """,
    tags=("window-function", "sequence", "path-mining"),
)

register(
    "sf_robust_outlier_stats",
    relational.robust_outlier_stats,
    sql="""
    WITH m AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
      FROM events GROUP BY event_type
    ), r AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS resid
      FROM events e JOIN m USING (event_type)
    ), d AS (
      SELECT event_type, med,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY resid) AS mad
      FROM r GROUP BY event_type, med
    )
    SELECT r.event_type, count(*) AS n,
           round(d.med, 2) AS median, round(d.mad, 2) AS mad,
           CAST(sum(CASE WHEN r.resid > 3.0 * 1.4826 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM r JOIN d USING (event_type)
    GROUP BY r.event_type, d.med, d.mad
    """,
    tags=("agg", "percentile", "robust"),
)

register(
    "a7_event_association_rules",
    agg.event_association_rules,
    sql="""
    WITH baskets AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), n AS (
      SELECT count(DISTINCT user_id) AS n_users FROM baskets
    ), t AS (
      SELECT event_type, count(*) AS n_t FROM baskets GROUP BY event_type
    ), p AS (
      SELECT a.event_type AS a, b.event_type AS b, count(*) AS n_ab
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.a, p.b, p.n_ab,
           round(p.n_ab / CAST(n.n_users AS DOUBLE), 6) AS support,
           round(p.n_ab / CAST(ta.n_t AS DOUBLE), 6) AS conf_a_to_b,
           round(p.n_ab / CAST(tb.n_t AS DOUBLE), 6) AS conf_b_to_a,
           round(p.n_ab * CAST(n.n_users AS DOUBLE)
                 / (ta.n_t * CAST(tb.n_t AS DOUBLE)), 6) AS lift
    FROM p
    JOIN t ta ON p.a = ta.event_type
    JOIN t tb ON p.b = tb.event_type
    CROSS JOIN n
    """,
    tags=("agg", "association", "basket"),
)

# --- TPC-H pattern completions (adapted to the harness schema: no
# partsupp / shipmode / commit-receipt dates — see each operator's
# docstring for the adaptation) ---

register(
    "q2_min_cost_supplier",
    joins.min_cost_supplier,
    sql="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem GROUP BY 1, 2
    ), ranked AS (
      SELECT p_partkey, p_type, l_suppkey, supply_cost,
             row_number() OVER (PARTITION BY p_partkey
                                ORDER BY supply_cost, l_suppkey) AS rn
      FROM cost JOIN part ON l_partkey = p_partkey
      WHERE p_size < 15 AND p_type = 'STANDARD'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           round(supply_cost, 2) AS supply_cost
    FROM ranked
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE rn = 1
    ORDER BY s_acctbal DESC, p_partkey
    LIMIT 100
    """,
    tags=("join", "tpch", "argmin", "window"),
)

register(
    "q11_important_part_values",
    joins.important_part_values,
    sql="""
    WITH supp AS (
      SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_1'
    ), v AS (
      SELECT l_partkey,
             sum(l_extendedprice * (1 - l_discount)) AS raw_value
      FROM lineitem JOIN supp ON l_suppkey = s_suppkey
      GROUP BY 1
    )
    SELECT l_partkey, round(raw_value, 2) AS part_value
    FROM v
    WHERE raw_value > (SELECT sum(raw_value) * 0.001 FROM v)
    """,
    tags=("join", "tpch", "subquery", "having"),
)

register(
    "q12_late_shipment_modes",
    joins.late_shipment_modes,
    sql="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_linestatus
    """,
    tags=("join", "tpch", "conditional-agg"),
)

register(
    "q20_excess_suppliers",
    joins.excess_part_suppliers,
    sql="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ), t AS (
      SELECT *, sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
      FROM pq
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT DISTINCT l_suppkey
      FROM t JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%' AND supp_qty > 0.5 * part_qty)
    ORDER BY s_name
    """,
    tags=("join", "tpch", "semi", "window"),
)

# --- Incremental maintenance: CDC merge + SCD2 (operators/incremental.py) ---

from .operators import incremental  # noqa: E402

register(
    "cdc_upsert_state",
    incremental.cdc_upsert_state,
    sql="""
    WITH base AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '2024-01-16 00:00:00'
    ), delta AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts > TIMESTAMP '2024-01-16 00:00:00'
    )
    SELECT coalesce(b.user_id, d.user_id) AS user_id,
           coalesce(d.event_type, b.event_type) AS state_event_type,
           coalesce(d.value, b.value) AS state_value,
           coalesce(d.ts, b.ts) AS state_ts,
           d.user_id IS NOT NULL AS updated
    FROM (SELECT * FROM base WHERE rn = 1) b
    FULL OUTER JOIN (SELECT * FROM delta WHERE rn = 1) d
      ON b.user_id = d.user_id
    """,
    tags=("incremental", "merge", "cdc", "outer"),
)

register(
    "scd2_user_history",
    incremental.scd2_user_history,
    sql="""
    SELECT user_id, event_type, value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) IS NULL AS is_current
    FROM events
    WHERE user_id % 20 = 0
    """,
    tags=("incremental", "scd2", "window"),
)

register(
    "ts_ohlc_hourly",
    relational.ohlc_hourly,
    sql="""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           (min({'ts': ts, 'eid': event_id, 'v': value})).v AS open,
           max(value) AS high,
           min(value) AS low,
           (max({'ts': ts, 'eid': event_id, 'v': value})).v AS close,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    tags=("timeseries", "rollup", "ohlc"),
)

register(
    "sf_variant_props_stats",
    relational.variant_props_stats,
    sql="""
    SELECT event_type,
           CAST(CAST(props ->> '$.k' AS INT) // 10 AS BIGINT) AS k_decile,
           count(*) AS n,
           CAST(sum(CAST(props ->> '$.k' AS INT)) AS BIGINT) AS sum_k
    FROM events GROUP BY 1, 2
    """,
    tags=("scalar", "json", "variant"),
)

register(
    "wf_revenue_mom_change",
    relational.revenue_mom_change,
    sql="""
    WITH m AS (
      SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
             sum(o_totalprice) AS raw_rev
      FROM orders GROUP BY 1, 2
    )
    SELECT o_year, o_month,
           round(raw_rev, 2) AS revenue,
           round(lag(raw_rev) OVER (ORDER BY o_year, o_month), 2) AS prev_revenue,
           round((raw_rev - lag(raw_rev) OVER (ORDER BY o_year, o_month))
                 / lag(raw_rev) OVER (ORDER BY o_year, o_month) * 100.0,
                 4) AS pct_change
    FROM m
    """,
    tags=("window", "timeseries", "bi"),
)

# --- Graph analytics: iterative PageRank with an unrolled-CTE oracle ---

from .operators import graph  # noqa: E402


def _pagerank_sql(n_iter: int = 5, d: float = 0.85) -> str:
    """Unroll the fixed-iteration PageRank recurrence as chained CTEs —
    the exact SQL twin of the lazy iterative plan in
    ``operators/graph.py`` (same IEEE ops in the same order)."""
    iters = []
    prev = "r0"
    for i in range(1, n_iter + 1):
        iters.append(
            f""", r{i} AS (
      SELECT n.node,
             (1 - {d}) / (SELECT nn FROM cnt)
             + {d} * coalesce(m.mass, 0) AS rank
      FROM n LEFT JOIN (
        SELECT p.dst, sum(r.rank * p.p) AS mass
        FROM p JOIN {prev} r ON r.node = p.src GROUP BY p.dst
      ) m ON m.dst = n.node
    )"""
        )
        prev = f"r{i}"
    return f"""
    WITH e AS (
      SELECT c_nationkey AS src, s_nationkey AS dst,
             sum(l_extendedprice * (1 - l_discount)) AS w
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ), n AS (SELECT n_nationkey AS node FROM nation),
    cnt AS (SELECT count(*) AS nn FROM n),
    p AS (SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p FROM e),
    r0 AS (SELECT node, 1.0 / (SELECT nn FROM cnt) AS rank FROM n){''.join(iters)}
    SELECT n_name, round(rank, 6) AS rank
    FROM {prev} JOIN nation ON node = n_nationkey
    """


register(
    "graph_trade_pagerank",
    graph.trade_pagerank,
    sql=_pagerank_sql(),
    tags=("graph", "iterative", "pagerank"),
)

# merges hourly -> daily -> monthly partials; the oracle aggregates the
# raw events directly — identical answers prove the partials merge
register(
    "ts_rollup_tree_monthly",
    relational.rollup_tree_monthly,
    sql="""
    SELECT date_trunc('month', ts) AS month,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           round(sum(value) / count(*), 2) AS avg_value
    FROM events GROUP BY 1
    """,
    tags=("timeseries", "rollup", "mergeable"),
)

# Population Stability Index between the month's two halves; fixed
# reference-time bucket edges keep it two cascaded aggs, no quantile
# recompute (the production drift-monitor shape)
register(
    "sf_psi_drift",
    relational.psi_drift_by_type,
    sql="""
    WITH cells AS (
      SELECT event_type,
             CASE WHEN day(ts) <= 15 THEN 'ref' ELSE 'live' END AS half,
             CASE WHEN value >= 250.0 THEN 9 WHEN value >= 150.0 THEN 8
                  WHEN value >= 100.0 THEN 7 WHEN value >= 75.0 THEN 6
                  WHEN value >= 50.0 THEN 5 WHEN value >= 35.0 THEN 4
                  WHEN value >= 20.0 THEN 3 WHEN value >= 10.0 THEN 2
                  WHEN value >= 5.0 THEN 1 ELSE 0 END AS bucket,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3
    ), frac AS (
      SELECT event_type, half, bucket,
             (n + 0.5) / (sum(n) OVER (PARTITION BY event_type, half) + 0.5 * 10) AS p
      FROM cells
    ), ref AS (SELECT event_type, bucket, p AS p_ref FROM frac WHERE half = 'ref'),
    live AS (SELECT event_type, bucket, p AS p_live FROM frac WHERE half = 'live'),
    per_bucket AS (
      SELECT coalesce(ref.event_type, live.event_type) AS event_type,
             (coalesce(p_live, 0) - coalesce(p_ref, 0))
               * ln(coalesce(p_live, 1e-12) / coalesce(p_ref, 1e-12)) AS term
      FROM ref FULL JOIN live USING (event_type, bucket)
    ), psi AS (
      SELECT event_type, round(sum(term), 6) AS psi FROM per_bucket GROUP BY event_type
    )
    SELECT event_type, psi,
           CASE WHEN psi < 0.1 THEN 'stable'
                WHEN psi < 0.25 THEN 'moderate'
                ELSE 'shifted' END AS verdict
    FROM psi
    """,
    tags=("drift", "monitoring", "psi"),
)

# Deequ-style constraint suite: one shared full-scan aggregate, one
# row per constraint
register(
    "dq_constraint_suite",
    relational.dq_constraint_suite,
    sql="""
    WITH m AS (
      SELECT count(*) AS n_rows,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS null_value,
             sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS null_user,
             count(DISTINCT event_id) AS distinct_ids,
             sum(CASE WHEN value < 0 OR value > 1000 THEN 1 ELSE 0 END) AS out_of_range,
             sum(CASE WHEN event_type NOT IN ('view','click','signup','purchase','error')
                      THEN 1 ELSE 0 END) AS bad_type,
             sum(CASE WHEN year(ts) < 2000 THEN 1 ELSE 0 END) AS bad_ts
      FROM events
    )
    SELECT 'value_complete' AS constraint,
           round(1.0 - CAST(null_value AS DOUBLE) / n_rows, 6) AS metric,
           null_value = 0 AS passed FROM m
    UNION ALL SELECT 'user_complete',
           round(1.0 - CAST(null_user AS DOUBLE) / n_rows, 6), null_user = 0 FROM m
    UNION ALL SELECT 'event_id_unique',
           round(CAST(distinct_ids AS DOUBLE) / n_rows, 6), distinct_ids = n_rows FROM m
    UNION ALL SELECT 'value_in_range',
           round(1.0 - CAST(out_of_range AS DOUBLE) / n_rows, 6), out_of_range = 0 FROM m
    UNION ALL SELECT 'type_in_set',
           round(1.0 - CAST(bad_type AS DOUBLE) / n_rows, 6), bad_type = 0 FROM m
    UNION ALL SELECT 'ts_sane',
           round(1.0 - CAST(bad_ts AS DOUBLE) / n_rows, 6), bad_ts = 0 FROM m
    """,
    tags=("data-quality", "constraints"),
)

# right-to-be-forgotten: dynamic partition overwrite of ONE user-hash
# bucket; the audit (before/after/deleted per bucket) is SQL-exact
register(
    "gdpr_forget_audit",
    incremental.gdpr_forget_audit,
    sql="""
    SELECT CAST(user_id % 20 AS INT) AS user_bucket,
           count(*) AS n_before,
           CAST(sum(CASE WHEN user_id % 40 = 7 THEN 0 ELSE 1 END) AS BIGINT) AS n_after,
           CAST(sum(CASE WHEN user_id % 40 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
           CAST(user_id % 20 AS INT) = 7 AS rewritten
    FROM events GROUP BY 1, 5
    """,
    tags=("incremental", "gdpr", "partition-rewrite"),
)

# point-in-time join: strict-before window frame makes label leakage
# structurally impossible; oracle uses the identical frame
register(
    "ptj_training_features",
    incremental.point_in_time_features,
    sql="""
    WITH c AS (
      SELECT user_id, event_id, event_type, ts, value,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ), s AS (
      SELECT user_id, event_id, event_type,
             round(value, 2) AS label_value,
             count(cents) OVER w_prev AS feat_n_events,
             round(CAST(sum(cents) OVER w_prev AS DOUBLE)
                   / count(cents) OVER w_prev / 100.0, 4) AS feat_avg_value
      FROM c
      WINDOW w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, label_value, feat_n_events, feat_avg_value
    FROM s WHERE event_type = 'purchase'
    """,
    tags=("feature-store", "point-in-time", "window"),
)


# --- ER-series: entity resolution / record linkage (blocked fuzzy
# matching; operators/entity_resolution.py). Both engines implement
# unit-cost Levenshtein, so the pair scores are exactly comparable. ---
from .operators import entity_resolution  # noqa: E402

_ER_PAIRS_SQL = """
    WITH blocked AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer
      QUALIFY count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) <= 10000
    )
    SELECT a.c_custkey AS a_custkey,
           b.c_custkey AS b_custkey,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS name_dist,
           round(abs(a.bal - b.bal), 2) AS bal_gap
    FROM blocked a
    JOIN blocked b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {max_dist}
"""

register(
    "er_candidate_pairs",
    entity_resolution.candidate_pairs,
    sql=_ER_PAIRS_SQL.format(max_dist=entity_resolution.CANDIDATE_DIST),
    tags=("entity-resolution", "blocking", "fuzzy-match"),
)

register(
    "er_entity_clusters",
    entity_resolution.entity_clusters,
    # the same recursive-CTE transitive-closure oracle the dedup
    # cluster families use, over the confident-match edge list
    sql=f"""
    WITH RECURSIVE mp AS (
      SELECT a_custkey AS a_id, b_custkey AS b_id
      FROM ({_ER_PAIRS_SQL.format(max_dist=entity_resolution.MATCH_DIST)}) q
    ), edges AS (
      SELECT a_id AS s, b_id AS d FROM mp
      UNION
      SELECT b_id, a_id FROM mp
    ), reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ), nodes AS (
      SELECT DISTINCT s AS node FROM edges
    )
    SELECT n.node AS c_custkey,
           least(n.node, min(r.d)) AS entity_rep,
           n.node = least(n.node, min(r.d)) AS is_rep
    FROM nodes n JOIN reach r ON r.s = n.node
    GROUP BY n.node
    """,
    tags=("entity-resolution", "clustering", "iterative"),
)

register(
    "er_lossless_fuzzy_names",
    entity_resolution.lossless_fuzzy_name_pairs,
    # the oracle is the NAIVE all-pairs levenshtein join — hash match
    # certifies the length-band replication blocking is lossless
    sql=entity_resolution.LOSSLESS_FUZZY_SQL,
    tags=("entity-resolution", "fuzzy-match", "lossless-blocking"),
)


register(
    "mta_linear_attribution",
    relational.multitouch_attribution,
    # identical RANGE frame over epoch-microseconds; credits become
    # exact integer millicents per purchase before summation
    sql="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS tus,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ), counted AS (
      SELECT event_type, cents,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER w AS n_click,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER w AS n_view,
             sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               OVER w AS n_signup
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY tus
                   RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)
    ), p AS (
      SELECT cents,
             COALESCE(n_click, 0) AS n_click,
             COALESCE(n_view, 0) AS n_view,
             COALESCE(n_signup, 0) AS n_signup,
             COALESCE(n_click, 0) + COALESCE(n_view, 0)
               + COALESCE(n_signup, 0) AS n_touch
      FROM counted WHERE event_type = 'purchase'
    ), credited AS (
      SELECT t.touch_type,
             -- integer half-up (2n + d) // 2d, mirroring the Spark
             -- side's DIV — no float round at exact ties
             CAST((2 * p.cents * t.n_t * 1000 + p.n_touch)
                  // (2 * p.n_touch) AS BIGINT)
               AS credit_mc,
             CASE WHEN t.n_t > 0 THEN 1 ELSE 0 END AS hit
      FROM p, LATERAL (VALUES ('click', p.n_click),
                              ('view', p.n_view),
                              ('signup', p.n_signup)) AS t(touch_type, n_t)
      WHERE p.n_touch > 0
    )
    SELECT touch_type,
           CAST(sum(hit) AS BIGINT) AS n_purchases_credited,
           round(sum(credit_mc) / 100000.0, 2) AS credited_revenue
    FROM credited GROUP BY touch_type
    """,
    tags=("attribution", "window", "event-time"),
)


register(
    "dq_referential_integrity",
    relational.dq_referential_integrity,
    sql="""
    SELECT edge, n_child, n_orphan, n_orphan = 0 AS ok FROM (
    SELECT 'lineitem.l_orderkey->orders' AS edge,
           (SELECT count(*) FROM lineitem) AS n_child,
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS n_orphan
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders x
             WHERE NOT EXISTS (SELECT 1 FROM customer p
                               WHERE p.c_custkey = x.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer x
             WHERE NOT EXISTS (SELECT 1 FROM nation p
                               WHERE p.n_nationkey = x.c_nationkey))
    UNION ALL
    SELECT 'supplier.s_nationkey->nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier x
             WHERE NOT EXISTS (SELECT 1 FROM nation p
                               WHERE p.n_nationkey = x.s_nationkey))
    UNION ALL
    SELECT 'nation.n_regionkey->region',
           (SELECT count(*) FROM nation),
           (SELECT count(*) FROM nation x
             WHERE NOT EXISTS (SELECT 1 FROM region p
                               WHERE p.r_regionkey = x.n_regionkey))
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem x
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = x.l_partkey))
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem x
             WHERE NOT EXISTS (SELECT 1 FROM supplier p
                               WHERE p.s_suppkey = x.l_suppkey))
    )
    """,
    tags=("data-quality", "referential-integrity", "join"),
)


register(
    "wf_value_deciles",
    relational.value_deciles_by_type,
    # identical ntile tie-break (value, event_id) on both engines
    sql="""
    SELECT event_type, CAST(decile AS BIGINT) AS decile,
           count(*) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi,
           round(avg(value), 2) AS mean_value
    FROM (
      SELECT event_type, value,
             ntile(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS decile
      FROM events
    ) GROUP BY event_type, decile
    """,
    tags=("window", "quantiles", "profiling"),
)


register(
    "j7_lateral_top_orders",
    relational.lateral_top_orders,
    sql=relational.LATERAL_TOP_ORDERS_SQL,
    tags=("join", "lateral", "correlated"),
)


register(
    "wf_activity_streaks",
    relational.activity_streaks,
    # identical anchor trick: consecutive days share day - rn
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), anchored AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INT) AS anchor
      FROM days
    ), streaks AS (
      SELECT user_id, anchor, count(*) AS len
      FROM anchored GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id
    """,
    tags=("window", "gaps-and-islands", "retention"),
)


register(
    "wf_peak_concurrency",
    relational.peak_session_concurrency,
    # same sessionization, then a plain global running sum — the
    # oracle may single-sort; the Spark side must not (see operator)
    sql="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    ), intervals AS (
      SELECT user_id, session_id,
             min(ts) AS start_ts, max(ts) AS end_ts
      FROM sess GROUP BY user_id, session_id
    ), deltas AS (
      SELECT start_ts AS ts, 1 AS d FROM intervals
      UNION ALL
      SELECT end_ts + INTERVAL 1 MICROSECOND, -1 FROM intervals
    ), net AS (
      SELECT ts, sum(d) AS net FROM deltas GROUP BY ts
    ), run AS (
      SELECT ts, sum(net) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS active
      FROM net
    )
    SELECT CAST(active AS BIGINT) AS peak_concurrency, min(ts) AS peak_at
    FROM run
    WHERE active = (SELECT max(active) FROM run)
    GROUP BY active
    """,
    tags=("window", "sweep-line", "prefix-sum"),
)


_TRADE_EDGE_CTE = """
    e AS (
      SELECT c_nationkey AS src, s_nationkey AS dst,
             sum(l_extendedprice * (1 - l_discount)) AS w
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    )"""

# canonical a<b<c enumeration over the same undirected pair set
register(
    "graph_trade_triangles",
    graph.trade_triangles,
    sql=f"""
    WITH {_TRADE_EDGE_CTE},
    pairs AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM e WHERE src <> dst
    ), tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM pairs e1
      JOIN pairs e2 ON e1.b = e2.a
      JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    ), per_node AS (
      SELECT node, count(*) AS n FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY node
    )
    SELECT n_name, CAST(coalesce(n, 0) AS BIGINT) AS n_triangles
    FROM nation LEFT JOIN per_node ON n_nationkey = node
    """,
    tags=("graph", "triangles", "join"),
)

# recursive-CTE twin of the fixed-iteration frontier BFS
register(
    "graph_trade_bfs_hops",
    graph.trade_bfs_hops,
    sql=f"""
    WITH RECURSIVE {_TRADE_EDGE_CTE},
    sparse AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY round(w, 2) DESC, dst) AS rk
        FROM e WHERE src <> dst
      ) WHERE rk <= {graph.TOP_EDGES_PER_SRC}
    ), walk(node, hops) AS (
      SELECT CAST({graph.BFS_SOURCE} AS BIGINT), 0
      UNION ALL
      SELECT sparse.dst, walk.hops + 1
      FROM walk JOIN sparse ON walk.node = sparse.src
      WHERE walk.hops < {graph.MAX_HOPS}
    )
    SELECT n_name, CAST(min(hops) AS INT) AS hops
    FROM walk JOIN nation ON n_nationkey = node
    GROUP BY n_name
    """,
    tags=("graph", "bfs", "iterative", "recursive-cte"),
)


def _lpa_sql() -> str:
    """CTE-chain replay of the synchronous weighted label propagation
    (one m/p/l trio per iteration, mirroring the Spark loop): integer
    cent weights make every mass comparison engine-exact."""
    ctes = [
        "ed AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, "
        "sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) "
        "AS BIGINT)) AS w "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2)",
        "edges AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM "
        "(SELECT src, dst, w FROM ed "
        "UNION ALL SELECT dst, src, w FROM ed) GROUP BY src, dst)",
        "l0 AS (SELECT n_nationkey AS node, "
        "CAST(n_nationkey AS BIGINT) AS label FROM nation)",
    ]
    for t in range(1, graph.LPA_ITER + 1):
        p = t - 1
        ctes += [
            f"m{t} AS (SELECT e.src AS node, l.label, sum(e.w) AS m "
            f"FROM edges e JOIN l{p} l ON l.node = e.dst GROUP BY 1, 2)",
            f"p{t} AS (SELECT node, label AS new_label FROM "
            f"(SELECT m{t}.*, row_number() OVER (PARTITION BY node "
            f"ORDER BY m DESC, label) AS rn FROM m{t}) WHERE rn = 1)",
            f"l{t} AS (SELECT l.node, coalesce(p.new_label, l.label) AS label "
            f"FROM l{p} l LEFT JOIN p{t} p ON p.node = l.node)",
        ]
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT n_name, CAST(label AS BIGINT) AS community
    FROM l{graph.LPA_ITER} JOIN nation ON node = n_nationkey
    """
    )


register(
    "graph_trade_communities",
    graph.trade_label_propagation,
    sql=_lpa_sql(),
    tags=("graph", "communities", "label-propagation", "iterative"),
)


# band self-join on row offsets computes the same truncated decay
# weights the Spark side applies via array HOFs
register(
    "ts_ewma_daily_value",
    relational.ewma_daily_value,
    # decay/band interpolated from the module constants so the twin
    # cannot silently desynchronize from the Spark side
    sql=f"""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(value) AS v
      FROM events GROUP BY 1, 2
    ), rn AS (
      SELECT user_id, day, v,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM daily
    )
    SELECT a.user_id, CAST(a.day AS TIMESTAMP) AS day,
           round(sum(b.v * power({1.0 - relational.EWMA_ALPHA}, a.rn - b.rn))
                 / sum(power({1.0 - relational.EWMA_ALPHA}, a.rn - b.rn)), 6)
             AS ewma
    FROM rn a JOIN rn b
      ON a.user_id = b.user_id
     AND b.rn BETWEEN a.rn - {relational.EWMA_SPAN_ROWS - 1} AND a.rn
    GROUP BY a.user_id, a.day
    """,
    tags=("timeseries", "ewma", "array-hof"),
)


# same 7x membership amplification, window days restricted to days
# that actually occur
register(
    "ts_rolling_distinct_users",
    relational.rolling_distinct_users,
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), contrib AS (
      SELECT user_id, day + CAST(i AS INT) AS win_day
      FROM days, range(0, 7) r(i)
    ), present AS (
      SELECT DISTINCT day FROM days
    )
    SELECT CAST(c.win_day AS TIMESTAMP) AS win_day,
           CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users
    FROM contrib c JOIN present p ON c.win_day = p.day
    GROUP BY c.win_day
    """,
    tags=("timeseries", "rolling-distinct", "window"),
)


# per-column UNION ALL in the oracle; the Spark side is one scan with
# a multi-distinct Expand
register(
    "dq_table_profile",
    relational.dq_table_profile,
    sql="""
    WITH n AS (SELECT count(*) AS n_rows FROM orders)
    SELECT n.n_rows, p.column_name, p.n_nulls, p.n_distinct
    FROM n, (
      SELECT 'o_orderkey' AS column_name,
             CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
      FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(count(*) - count(o_custkey) AS BIGINT),
             CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', CAST(count(*) - count(o_orderstatus) AS BIGINT),
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_totalprice', CAST(count(*) - count(o_totalprice) AS BIGINT),
             CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_orderdate', CAST(count(*) - count(o_orderdate) AS BIGINT),
             CAST(count(DISTINCT o_orderdate) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_orderpriority', CAST(count(*) - count(o_orderpriority) AS BIGINT),
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders
    ) p
    """,
    tags=("data-quality", "profile", "multi-distinct"),
)


# aggregate-then-join: lineitem collapses to order grain before the
# header join; both engines round the drift stats at 1e-2
register(
    "dq_order_reconciliation",
    relational.dq_order_reconciliation,
    sql="""
    WITH per_order AS (
      SELECT l_orderkey,
             sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS li_total
      FROM lineitem GROUP BY l_orderkey
    ), joined AS (
      SELECT o_orderstatus, o_totalprice,
             coalesce(li_total, 0.0) AS li_total
      FROM orders LEFT JOIN per_order ON o_orderkey = l_orderkey
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN abs(o_totalprice - li_total) > 0.01
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
           round(sum(o_totalprice - li_total), 2) AS total_gap,
           round(max(abs(o_totalprice - li_total)), 2) AS max_abs_gap
    FROM joined GROUP BY o_orderstatus
    """,
    tags=("data-quality", "reconciliation", "join"),
)

# both engines rebuild the identical derived snapshot, so the diff
# classification is exactly reproducible
register(
    "dq_snapshot_diff",
    relational.snapshot_diff_stats,
    sql="""
    WITH a AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 31 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT -o_orderkey - 1, 'N', o_totalprice
      FROM orders WHERE o_orderkey % 101 = 0
    ), d AS (
      SELECT CASE
               WHEN b.o_orderkey IS NULL THEN 'deleted'
               WHEN a.o_orderkey IS NULL THEN 'inserted'
               WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                 OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
                 THEN 'changed'
               ELSE 'unchanged'
             END AS change_kind
      FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    )
    SELECT change_kind, count(*) AS n_rows FROM d GROUP BY change_kind
    """,
    tags=("data-quality", "snapshot-diff", "full-outer"),
)


register(
    "sf_winsorize_values",
    relational.winsorize_values,
    sql="""
    WITH th AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS lo,
             quantile_cont(value, 0.99) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN e.value < th.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_lo,
           CAST(sum(CASE WHEN e.value > th.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_hi,
           round(avg(e.value), 4) AS mean_before,
           round(avg(least(greatest(e.value, th.lo), th.hi)), 4) AS mean_after,
           round(min(th.lo), 4) AS p01,
           round(min(th.hi), 4) AS p99
    FROM events e JOIN th ON e.event_type = th.event_type
    GROUP BY e.event_type
    """,
    tags=("scalar", "winsorize", "preprocessing"),
)

register(
    "dq_join_fanout_audit",
    relational.dq_join_fanout_audit,
    sql="""
    WITH a AS (
      SELECT o_orderkey AS k, count(*) AS ca FROM orders GROUP BY o_orderkey
    ), b AS (
      SELECT l_orderkey AS k, count(*) AS cb FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(sum(ca * cb) AS BIGINT) AS join_rows,
           CAST(max(ca) AS BIGINT) AS max_mult_orders,
           CAST(max(cb) AS BIGINT) AS max_mult_lineitem,
           CAST(count(*) AS BIGINT) AS n_matching_keys
    FROM a JOIN b ON a.k = b.k
    """,
    tags=("data-quality", "join-guard", "cardinality"),
)


# plain single-sorted running max in the oracle; quantile_cont matches
# Spark's interpolating percentile
register(
    "ts_watermark_lateness_profile",
    relational.watermark_lateness_profile,
    sql="""
    WITH e AS (
      SELECT event_id, epoch_us(ts) AS tus FROM events
    ), run AS (
      SELECT tus,
             coalesce(max(tus) OVER (ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), tus) AS seen_max
      FROM e
    ), lat AS (
      SELECT greatest((seen_max - tus) / 1000000.0, 0.0) AS lateness_s
      FROM run
    )
    SELECT count(*) AS n_events,
           CAST(sum(CASE WHEN lateness_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           round(quantile_cont(lateness_s, 0.5), 3) AS p50_lateness_s,
           round(quantile_cont(lateness_s, 0.95), 3) AS p95_lateness_s,
           round(max(lateness_s), 3) AS max_lateness_s,
           CAST(ceil(quantile_cont(lateness_s, 0.95)) AS BIGINT)
             AS recommended_delay_s
    FROM lat
    """,
    tags=("timeseries", "watermark", "prefix-max"),
)


register(
    "sf_ols_trend_by_type",
    relational.ols_trend_by_type,
    sql=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(value) AS y
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           count(*) AS n_days,
           round(regr_slope(y, date_diff('day',
                 DATE '{relational.TREND_ORIGIN}', day)), 4) AS slope,
           round(regr_intercept(y, date_diff('day',
                 DATE '{relational.TREND_ORIGIN}', day)), 4) AS intercept,
           round(regr_r2(y, date_diff('day',
                 DATE '{relational.TREND_ORIGIN}', day)), 4) AS r2
    FROM daily GROUP BY event_type
    """,
    tags=("stats", "regression", "trend"),
)

# robust twin of the OLS trend: integer-cent daily totals make every
# pairwise slope and the interpolated median engine-exact
register(
    "sf_theilsen_trend",
    relational.theilsen_trend_by_type,
    sql="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             CAST(b.cents - a.cents AS DOUBLE)
               / date_diff('day', a.day, b.day) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(slope, 0.5) / 100.0, 4) AS trend_per_day
    FROM pairs GROUP BY event_type
    """,
    tags=("stats", "robust", "trend", "theil-sen"),
)

# full margin-product grid: empty cells contribute exp
register(
    "sf_chi2_lang_source",
    relational.chi2_lang_source,
    sql="""
    WITH cells AS (
      SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2
    ), rows_ AS (
      SELECT lang, sum(obs) AS row_tot FROM cells GROUP BY lang
    ), cols_ AS (
      SELECT source, sum(obs) AS col_tot FROM cells GROUP BY source
    ), grid AS (
      SELECT r.lang, c.source, r.row_tot, c.col_tot,
             coalesce(cl.obs, 0) AS obs
      FROM rows_ r CROSS JOIN cols_ c
      LEFT JOIN cells cl ON cl.lang = r.lang AND cl.source = c.source
    ), tot AS (SELECT sum(obs) AS n FROM grid)
    SELECT round(sum(pow(obs - row_tot * col_tot / n, 2)
                     / (row_tot * col_tot / n)), 6) AS chi2,
           CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
                AS BIGINT) AS dof,
           CAST(sum(obs) AS BIGINT) AS n_obs
    FROM grid, tot
    """,
    tags=("stats", "chi-square", "independence"),
)

register(
    "dq_benford_price_audit",
    relational.benford_price_audit,
    sql="""
    WITH d AS (
      SELECT CAST(floor(o_totalprice
                        / power(10, floor(log10(o_totalprice)))) AS INT)
               AS digit
      FROM orders WHERE o_totalprice > 0
    ), per_digit AS (
      SELECT digit, count(*) AS n FROM d GROUP BY digit
    ), tot AS (SELECT sum(n) AS t FROM per_digit)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           CAST(floor(n * 1000000 / t) AS BIGINT) AS observed_ppm,
           CAST(floor(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)
             AS expected_ppm,
           CAST(floor(n * 1000000 / t) AS BIGINT)
             - CAST(floor(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)
             AS deviation_ppm
    FROM per_digit, tot
    """,
    tags=("data-quality", "benford", "audit"),
)


# plain single-sorted ECDFs in the oracle; the statistic is integer
# cross-products until the final ppm floor on both sides
register(
    "sf_ks_test_chars",
    relational.ks_test_chars,
    sql="""
    WITH d AS (
      SELECT n_chars AS v, lang FROM documents WHERE lang IN ('en', 'de')
    ), per_value AS (
      SELECT v,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_en,
             sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS c_de
      FROM d GROUP BY v
    ), tot AS (
      SELECT sum(c_en) AS n_en, sum(c_de) AS n_de FROM per_value
    ), run AS (
      SELECT v,
             sum(c_en) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ce,
             sum(c_de) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cd
      FROM per_value
    )
    SELECT CAST(n_en AS BIGINT) AS n_en,
           CAST(n_de AS BIGINT) AS n_de,
           CAST(floor(abs(ce * n_de - cd * n_en) * 1000000.0
                      / (n_en * n_de)) AS BIGINT) AS d_ppm,
           CAST(v AS BIGINT) AS at_value
    FROM run, tot
    ORDER BY abs(ce * n_de - cd * n_en) DESC, v ASC
    LIMIT 1
    """,
    tags=("stats", "ks-test", "prefix-sum"),
)


# doubled midranks keep the rank sums exact bigints on both engines
register(
    "sf_mann_whitney_chars",
    relational.mann_whitney_chars,
    sql="""
    WITH d AS (
      SELECT n_chars AS v, lang FROM documents WHERE lang IN ('en', 'de')
    ), per_value AS (
      SELECT v,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_en,
             count(*) AS cnt
      FROM d GROUP BY v
    ), run AS (
      SELECT c_en, cnt,
             coalesce(sum(cnt) OVER (ORDER BY v
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS cum
      FROM per_value
    ), tot AS (
      SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en,
             sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS n_de
      FROM d
    ), r AS (
      SELECT sum(c_en * (2 * cum + cnt + 1)) AS r2_en FROM run
    )
    SELECT CAST(n_en AS BIGINT) AS n_en,
           CAST(n_de AS BIGINT) AS n_de,
           CAST(r2_en - n_en * (n_en + 1) AS BIGINT) AS u2_en,
           CAST(floor((r2_en - n_en * (n_en + 1)) * 500000
                      / (n_en * n_de)) AS BIGINT) AS auc_ppm
    FROM r, tot
    """,
    tags=("stats", "rank-sum", "prefix-sum"),
)

register(
    "sf_welch_ttest_value",
    relational.welch_ttest_value,
    sql="""
    WITH g AS (
      SELECT event_type, count(*) AS n, avg(value) AS m,
             var_samp(value) AS s2
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type
    ), p AS (
      SELECT max(CASE WHEN event_type = 'click' THEN n END) AS n1,
             max(CASE WHEN event_type = 'click' THEN m END) AS m1,
             max(CASE WHEN event_type = 'click' THEN s2 END) AS s21,
             max(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
             max(CASE WHEN event_type = 'purchase' THEN m END) AS m2,
             max(CASE WHEN event_type = 'purchase' THEN s2 END) AS s22
      FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n_click,
           CAST(n2 AS BIGINT) AS n_purchase,
           round(m1 - m2, 4) AS mean_diff,
           round((m1 - m2) / sqrt(s21 / n1 + s22 / n2), 4) AS t_stat,
           round(pow(s21 / n1 + s22 / n2, 2)
                 / (pow(s21 / n1, 2) / (n1 - 1)
                    + pow(s22 / n2, 2) / (n2 - 1)), 2) AS dof
    FROM p
    """,
    tags=("stats", "t-test", "ab-metric"),
)

register(
    "wf_km_survival",
    relational.km_survival_users,
    sql="""
    WITH horizon AS (
      SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS last_day
      FROM events
    ), users AS (
      SELECT date_diff('day', min(CAST(date_trunc('day', ts) AS DATE)),
                       max(CAST(date_trunc('day', ts) AS DATE))) AS t,
             CASE WHEN max(CAST(date_trunc('day', ts) AS DATE))
                       < (SELECT last_day FROM horizon)
                  THEN 1 ELSE 0 END AS event
      FROM events GROUP BY user_id
    ), per_t AS (
      SELECT t, sum(event) AS d, count(*) AS x FROM users GROUP BY t
    ), risk AS (
      SELECT t, d,
             sum(x) OVER () - coalesce(sum(x) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_t
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           round(CASE WHEN sum(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) > 0
                      THEN 0.0
                      ELSE exp(sum(ln(CASE WHEN d < n_risk
                                      THEN 1 - CAST(d AS DOUBLE) / n_risk
                                      ELSE 1.0 END))
                               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING))
                 END, 6) AS survival
    FROM risk
    QUALIFY d > 0
    """,
    tags=("stats", "survival", "censoring"),
)


# Poisson(1) weights from integer-ppm CDF thresholds: replicate
# membership is bit-exact cross-engine; only the final moments round
_BOOT_W = " + ".join(
    f"(CASE WHEN u_ppm >= {c} THEN 1 ELSE 0 END)"
    for c in relational.BOOT_CDF_PPM
)

register(
    "sf_bootstrap_mean_orders",
    relational.bootstrap_mean_orders,
    sql=f"""
    WITH r AS (
      SELECT o.o_totalprice,
             CAST(CONCAT('0x', substr(md5(CONCAT(CAST(o.o_orderkey AS VARCHAR),
                         '|', CAST(b.b AS VARCHAR))), 1, 8)) AS BIGINT)
               % 1000000 AS u_ppm,
             b.b
      FROM orders o
      CROSS JOIN (SELECT unnest(range(0, {relational.BOOT_B})) AS b) b
    ), rep AS (
      SELECT b,
             sum(({_BOOT_W}) * o_totalprice)
               / sum({_BOOT_W}) AS mean_b
      FROM r GROUP BY b
    ), point AS (
      SELECT count(*) AS n, avg(o_totalprice) AS mean_all FROM orders
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_replicates,
           round(mean_all, 3) AS point_mean,
           round(stddev_samp(mean_b), 3) AS se_boot,
           round(min(mean_b), 3) AS rep_min,
           round(max(mean_b), 3) AS rep_max
    FROM rep, point
    GROUP BY n, mean_all
    """,
    tags=("stats", "bootstrap", "resampling-free"),
)

register(
    "sf_cuped_adjusted_diff",
    relational.cuped_adjusted_diff,
    sql=f"""
    WITH users AS (
      SELECT user_id,
             sum(CASE WHEN ts >= TIMESTAMP '{relational.CUPED_SPLIT_DAY}'
                      THEN value ELSE 0 END) AS y,
             sum(CASE WHEN ts < TIMESTAMP '{relational.CUPED_SPLIT_DAY}'
                      THEN value ELSE 0 END) AS x,
             CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 2 AS arm
      FROM events GROUP BY user_id
    ), g AS (
      SELECT covar_samp(y, x) AS cyx, var_samp(x) AS vx,
             avg(x) AS mx, var_samp(y) AS vy
      FROM users
    ), adj AS (
      SELECT arm, y,
             y - (cyx / vx) * (x - mx) AS y_adj,
             vy - cyx * cyx / vx AS v_adj, vy
      FROM users, g
    )
    SELECT CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_treat,
           CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_control,
           round(avg(CASE WHEN arm = 1 THEN y END)
                 - avg(CASE WHEN arm = 0 THEN y END), 4) AS raw_diff,
           round(avg(CASE WHEN arm = 1 THEN y_adj END)
                 - avg(CASE WHEN arm = 0 THEN y_adj END), 4) AS cuped_diff,
           round(1 - any_value(v_adj) / any_value(vy), 4) AS var_reduction
    FROM adj
    """,
    tags=("stats", "cuped", "experimentation"),
)

register(
    "ts_acf_daily_value",
    relational.acf_daily_value,
    sql=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, sum(value) AS y
      FROM events GROUP BY 1
    ), lags AS (
      SELECT unnest(range(1, {relational.ACF_MAX_LAG} + 1)) AS lag
    )
    SELECT CAST(l.lag AS INT) AS lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(d.y, p.y), 4) AS acf
    FROM daily d
    CROSS JOIN lags l
    JOIN daily p ON p.day = d.day - CAST(l.lag AS INT)
    GROUP BY l.lag
    """,
    tags=("timeseries", "autocorrelation", "stats"),
)


def _morton_sql(x: str, y: str) -> str:
    """SQL Morton-code expression — same bit algebra as
    relational._interleave_bits, kept in lockstep."""
    terms = []
    for i in range(relational.Z_BITS):
        # DuckDB/Postgres precedence: + binds TIGHTER than <<, so each
        # shift term needs its own parens or the sum chain re-parses
        # as nested shifts
        terms.append(f"(((({x}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_ZXR = (
    "CAST(floor(date_diff('day', d_lo, CAST(o_orderdate AS DATE)) * 65535.0 "
    "/ date_diff('day', d_lo, d_hi)) AS BIGINT)"
)
_ZYR = "CAST(floor((o_totalprice - p_lo) * 65535.0 / (p_hi - p_lo)) AS BIGINT)"

register(
    "dq_zorder_pruning_audit",
    relational.zorder_pruning_audit,
    sql=f"""
    WITH bounds AS (
      SELECT min(CAST(o_orderdate AS DATE)) AS d_lo,
             max(CAST(o_orderdate AS DATE)) AS d_hi,
             min(o_totalprice) AS p_lo, max(o_totalprice) AS p_hi,
             max(o_orderkey) AS k_hi
      FROM orders
    ), tagged AS (
      SELECT CAST(o_orderdate AS DATE) AS d, o_totalprice AS p,
             CASE WHEN CAST(o_orderdate AS DATE)
                        BETWEEN DATE '{relational.ZQ_DATE_LO}'
                        AND DATE '{relational.ZQ_DATE_HI}'
                   AND o_totalprice BETWEEN {relational.ZQ_PRICE_LO}
                        AND {relational.ZQ_PRICE_HI}
                  THEN 1 ELSE 0 END AS hit,
             {_morton_sql(_ZXR, _ZYR)} >> {2 * relational.Z_BITS - 6} AS zf,
             least(CAST(floor(o_orderkey * {relational.Z_FILES}
                              / (k_hi + 1.0)) AS BIGINT),
                   {relational.Z_FILES - 1}) AS kf
      FROM orders, bounds
    ), exploded AS (
      SELECT d, p, hit, 'zorder' AS layout, zf AS f FROM tagged
      UNION ALL
      SELECT d, p, hit, 'keyorder' AS layout, kf AS f FROM tagged
    ), files AS (
      SELECT layout, f, count(*) AS rows_, sum(hit) AS hits,
             min(d) AS dmin, max(d) AS dmax,
             min(p) AS pmin, max(p) AS pmax
      FROM exploded GROUP BY layout, f
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN dmin <= DATE '{relational.ZQ_DATE_HI}'
                          AND dmax >= DATE '{relational.ZQ_DATE_LO}'
                          AND pmin <= {relational.ZQ_PRICE_HI}
                          AND pmax >= {relational.ZQ_PRICE_LO}
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(sum(rows_) AS BIGINT) AS rows_total,
           CAST(sum(hits) AS BIGINT) AS rows_matched,
           CAST(sum(CASE WHEN dmin <= DATE '{relational.ZQ_DATE_HI}'
                          AND dmax >= DATE '{relational.ZQ_DATE_LO}'
                          AND pmin <= {relational.ZQ_PRICE_HI}
                          AND pmax >= {relational.ZQ_PRICE_LO}
                     THEN rows_ ELSE 0 END) AS BIGINT) AS rows_scanned
    FROM files GROUP BY layout
    """,
    tags=("data-quality", "layout", "zorder", "pruning"),
)


_MTA_DECAY_FRAMES = "\n".join(
    f"""             sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tus
                     RANGE BETWEEN {(j + 1) * relational.MTA_HALF_LIFE_US}
                     PRECEDING AND {j * relational.MTA_HALF_LIFE_US + 1}
                     PRECEDING) AS n_{t}_{j},"""
    for t in ("click", "view", "signup")
    for j in range(relational.MTA_BUCKETS)
).rstrip(",")

_MTA_W = {
    t: " + ".join(
        f"{8 >> j} * COALESCE(n_{t}_{j}, 0)" for j in range(relational.MTA_BUCKETS)
    )
    for t in ("click", "view", "signup")
}

register(
    "mta_time_decay_attribution",
    relational.multitouch_time_decay,
    # half-life-bucketed decay: 12 RANGE frames over one per-user sort,
    # integer weights 8>>j, exact millicent credits (see the linear twin)
    sql=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS tus,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ), counted AS (
      SELECT event_type, cents,
{_MTA_DECAY_FRAMES}
      FROM ev
    ), p AS (
      SELECT cents,
             {_MTA_W['click']} AS w_click,
             {_MTA_W['view']} AS w_view,
             {_MTA_W['signup']} AS w_signup
      FROM counted WHERE event_type = 'purchase'
    ), q AS (
      SELECT cents, w_click, w_view, w_signup,
             w_click + w_view + w_signup AS w_touch
      FROM p
    ), credited AS (
      SELECT t.touch_type,
             -- integer half-up (2n + d) // 2d, mirroring the Spark
             -- side's DIV — no float round at exact ties
             CAST((2 * q.cents * t.w_t * 1000 + q.w_touch)
                  // (2 * q.w_touch) AS BIGINT)
               AS credit_mc,
             CASE WHEN t.w_t > 0 THEN 1 ELSE 0 END AS hit
      FROM q, LATERAL (VALUES ('click', q.w_click),
                              ('view', q.w_view),
                              ('signup', q.w_signup)) AS t(touch_type, w_t)
      WHERE q.w_touch > 0
    )
    SELECT touch_type,
           CAST(sum(hit) AS BIGINT) AS n_purchases_credited,
           round(sum(credit_mc) / 100000.0, 2) AS credited_revenue
    FROM credited GROUP BY touch_type
    """,
    tags=("attribution", "window", "time-decay"),
)


register(
    "wf_rfm_segments",
    relational.rfm_segments,
    sql="""
    WITH horizon AS (
      SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS last_day
      FROM events
    ), users AS (
      SELECT user_id,
             date_diff('day', max(CAST(date_trunc('day', ts) AS DATE)),
                       (SELECT last_day FROM horizon)) AS recency_days,
             count(*) AS frequency,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), q AS (
      SELECT user_id, frequency, cents,
             6 - ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC) AS r,
             ntile(5) OVER (ORDER BY frequency ASC, user_id ASC) AS f,
             ntile(5) OVER (ORDER BY cents ASC, user_id ASC) AS m
      FROM users
    )
    SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(frequency) AS BIGINT) AS n_purchases,
           round(sum(cents) / 100.0, 2) AS revenue
    FROM q GROUP BY 1
    """,
    tags=("window", "rfm", "segmentation"),
)


def _skew_sql(table: str, key: str, label: str) -> str:
    return f"""
      SELECT '{label}' AS key,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(floor(max(c) * 1000000.0 / sum(c)) AS BIGINT)
               AS top1_share_ppm,
             CAST(floor(sum(CASE WHEN top_i <= 10 THEN c ELSE 0 END)
                        * 1000000.0 / sum(c)) AS BIGINT) AS top10_share_ppm,
             CAST(floor((2 * sum(i * c) - (count(*) + 1) * sum(c))
                        * 1000000.0 / (count(*) * sum(c))) AS BIGINT)
               AS gini_ppm
      FROM (
        SELECT c,
               row_number() OVER (ORDER BY c ASC, k ASC) AS i,
               row_number() OVER (ORDER BY c DESC, k ASC) AS top_i
        FROM (SELECT {key} AS k, count(*) AS c FROM {table} GROUP BY 1)
      )
    """


register(
    "dq_key_skew_profile",
    relational.key_skew_profile,
    sql=f"""
    {_skew_sql("events", "user_id", "events.user_id")}
    UNION ALL
    {_skew_sql("lineitem", "l_orderkey", "lineitem.l_orderkey")}
    """,
    tags=("data-quality", "skew", "gini", "shuffle-planning"),
)

from .operators import bloom  # noqa: E402

register(
    "dq_bloom_semijoin_prune",
    bloom.bloom_semijoin_prune_audit,
    # exact semi-join counts verbatim; the Bloom-dependent parts
    # collapse to the two asserted filter guarantees (zero false
    # negatives, observed fpp <= FPP_BOUND) the oracle emits as true
    sql=bloom.BLOOM_SEMIJOIN_SQL,
    tags=("data-quality", "bloom", "runtime-filter", "semi-join"),
)

register(
    "sf_ab_power_analysis",
    relational.ab_power_analysis,
    sql=f"""
    WITH users AS (
      SELECT user_id, sum(value) AS y FROM events GROUP BY user_id
    ), m AS (
      SELECT count(*) AS n_users, avg(y) AS mean_y, var_samp(y) AS var_y
      FROM users
    ), grid AS (
      SELECT unnest(ARRAY{list(relational.POWER_MDE_PCT)}) AS mde_pct
    )
    SELECT CAST(mde_pct AS BIGINT) AS mde_pct,
           CAST(n_users AS BIGINT) AS n_users_observed,
           round(mean_y, 4) AS mean_y,
           round(sqrt(var_y), 4) AS sd_y,
           CAST(ceil(2 * {(relational.POWER_Z_ALPHA + relational.POWER_Z_BETA) ** 2}
                     * var_y / ((mean_y * mde_pct / 100.0)
                        * (mean_y * mde_pct / 100.0))) AS BIGINT)
             AS n_per_arm_needed,
           CAST(ceil(2 * {(relational.POWER_Z_ALPHA + relational.POWER_Z_BETA) ** 2}
                     * var_y / ((mean_y * mde_pct / 100.0)
                        * (mean_y * mde_pct / 100.0))) * 2 <= n_users
             AS BOOLEAN) AS feasible_now
    FROM m, grid
    """,
    tags=("stats", "power-analysis", "experimentation"),
)


register(
    "sf_fdr_bh_nations",
    relational.fdr_bh_nations,
    # the A&S erfc polynomial is interpolated from the SAME module
    # strings the Spark plan evaluates (relational.PVAL_*_EXPR)
    sql=f"""
    WITH g AS (
      SELECT c_nationkey, count(*) AS n, avg(c_acctbal) AS m
      FROM customer GROUP BY c_nationkey
    ), tot AS (
      SELECT avg(c_acctbal) AS ma, stddev_samp(c_acctbal) AS sa FROM customer
    ), z AS (
      SELECT c_nationkey, n, m, (m - ma) / (sa / sqrt(n)) AS zstat
      FROM g, tot
    ), pt AS (
      SELECT *, abs(zstat) / sqrt(2.0) AS az FROM z
    ), pt2 AS (
      SELECT *, {relational.PVAL_TT_EXPR} AS tt FROM pt
    ), pv AS (
      SELECT c_nationkey, n, m, zstat, {relational.PVAL_EXPR} AS p FROM pt2
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY p ASC, c_nationkey ASC) AS i,
             count(*) OVER () AS mt
      FROM pv
    ), adj AS (
      SELECT *, min(least(1.0, mt * p / i)) OVER (
               ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS p_bh
      FROM ranked
    )
    SELECT c_nationkey, CAST(n AS BIGINT) AS n_customers,
           round(m, 2) AS mean_bal, round(zstat, 4) AS z_stat,
           round(p, 6) AS p_value, round(p_bh, 6) AS p_bh,
           p_bh <= {relational.FDR_Q} AS reject_fdr
    FROM adj
    """,
    tags=("stats", "fdr", "multiple-testing"),
)


register(
    "ts_cusum_changepoint",
    relational.cusum_changepoint,
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, sum(value) AS x
      FROM events GROUP BY 1
    ), dev AS (
      SELECT day, x, avg(x) OVER () AS mx FROM daily
    ), cus AS (
      SELECT day, x,
             sum(x - mx) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
      FROM dev
    ), cp AS (
      SELECT day AS cp_day, abs(s) AS cmax
      FROM cus ORDER BY abs(s) DESC, day ASC LIMIT 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           cp_day AS changepoint_day,
           round(cmax, 2) AS cusum_max,
           round((SELECT avg(x) FROM daily d WHERE d.day <= cp.cp_day), 2)
             AS mean_before,
           round((SELECT avg(x) FROM daily d WHERE d.day > cp.cp_day), 2)
             AS mean_after
    FROM cp
    """,
    tags=("ts", "changepoint", "drift"),
)


register(
    "ts_seasonal_decompose_dow",
    relational.seasonal_decompose_dow,
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, sum(value) AS x
      FROM events GROUP BY 1
    ), det AS (
      SELECT day, x,
             x - avg(x) OVER (ORDER BY day
                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS det
      FROM daily
    ), dow AS (
      SELECT CAST(datediff('day', DATE '1970-01-05', day) % 7 AS BIGINT)
               AS dow_idx,
             det
      FROM det
    ), per AS (
      SELECT dow_idx, CAST(count(*) AS BIGINT) AS n_days, avg(det) AS md
      FROM dow GROUP BY dow_idx
    )
    SELECT dow_idx, n_days,
           round(md, 4) AS seasonal_raw,
           round(md - avg(md) OVER (), 4) AS seasonal_idx
    FROM per
    """,
    tags=("ts", "seasonality", "decomposition"),
)


register(
    "inc_rollup_maintenance",
    incremental.incremental_rollup_maintenance,
    # the oracle RECOMPUTES the rollup from scratch over all rows —
    # the hash match proves base+delta algebraic merge == recompute
    sql=f"""
    SELECT date_trunc('day', ts) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value,
           round(max(value), 2) AS max_value,
           sum(CASE WHEN ts <= TIMESTAMP '{incremental.ROLLUP_CUTOFF}'
                    THEN 1 ELSE 0 END) > 0
           AND sum(CASE WHEN ts > TIMESTAMP '{incremental.ROLLUP_CUTOFF}'
                        THEN 1 ELSE 0 END) > 0 AS was_merged
    FROM events GROUP BY 1, 2
    """,
    tags=("incremental", "materialized-view", "rollup"),
)


register(
    "sf_spearman_user_activity",
    relational.spearman_user_activity,
    # the oracle computes the same doubled midranks via plain rank()
    # windows — same semantics, different plan by design; the rank
    # SUMS are exact integers on both sides, so rho has zero
    # summation-order exposure
    sql="""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS x,
             round(sum(value), 2) AS y
      FROM events GROUP BY user_id
    ), r AS (
      SELECT x, y,
             2 * (rank() OVER (ORDER BY x) - 1)
               + count(*) OVER (PARTITION BY x) + 1 AS rx2,
             2 * (rank() OVER (ORDER BY y) - 1)
               + count(*) OVER (PARTITION BY y) + 1 AS ry2
      FROM u
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx2) AS BIGINT) AS sx,
             CAST(sum(ry2) AS BIGINT) AS sy,
             CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
             CAST(sum(ry2 * ry2) AS BIGINT) AS syy,
             CAST(sum(rx2 * ry2) AS BIGINT) AS sxy,
             avg(x) AS pmx, avg(y) AS pmy,
             avg(x * x) AS pxx, avg(y * y) AS pyy, avg(x * y) AS pxy
      FROM r
    )
    SELECT n AS n_users,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
                 4) AS spearman_rho,
           round((pxy - pmx * pmy)
                 / sqrt((pxx - pmx * pmx) * (pyy - pmy * pmy)), 4) AS pearson_r
    FROM m
    """,
    tags=("stats", "rank-correlation", "prefix-sum"),
)


register(
    "graph_trade_kcore",
    graph.trade_kcore,
    # unrolled synchronous peel as chained CTEs — integer-cent weights
    # and the exact median threshold make the edge set bit-identical
    sql=f"""
    WITH pairs AS (
      SELECT least(c.c_nationkey, s.s_nationkey) AS a,
             greatest(c.c_nationkey, s.s_nationkey) AS b,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                      AS BIGINT)) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ), kept AS (
      SELECT a, b FROM pairs WHERE w > (SELECT median(w) FROM pairs)
    ), e AS (
      SELECT a AS x, b AS y FROM kept UNION ALL SELECT b, a FROM kept
    ), d0 AS (
      SELECT x AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY x
    ), a1 AS (
      SELECT node FROM d0 WHERE d >= {graph.KCORE_K}
    ), d2 AS (
      SELECT e.x AS node, count(*) AS d
      FROM e JOIN a1 nx ON e.x = nx.node JOIN a1 ny ON e.y = ny.node
      GROUP BY e.x
    ), a2 AS (
      SELECT node FROM d2 WHERE d >= {graph.KCORE_K}
    ), d3 AS (
      SELECT e.x AS node, count(*) AS d
      FROM e JOIN a2 nx ON e.x = nx.node JOIN a2 ny ON e.y = ny.node
      GROUP BY e.x
    ), a3 AS (
      SELECT node FROM d3 WHERE d >= {graph.KCORE_K}
    )
    SELECT n.n_name,
           coalesce(d0.d, 0) AS degree_strong,
           a3.node IS NOT NULL AS in_kcore
    FROM nation n
    LEFT JOIN d0 ON n.n_nationkey = d0.node
    LEFT JOIN a3 ON n.n_nationkey = a3.node
    """,
    tags=("graph", "kcore", "iterative"),
)


# recursive-CTE replay of the identical Holt recurrence; daily input
# rounded to cents on both engines BEFORE the recurrence so the
# order-sensitive fold consumes engine-identical doubles; alpha/beta
# interpolated from the module constants so the twin cannot
# desynchronize from the Spark side
register(
    "ts_holt_linear_daily",
    relational.holt_linear_daily,
    sql=f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             round(sum(value), 2) AS x
      FROM events GROUP BY 1
    ), rn AS (
      SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM daily
    ), rec AS (
      SELECT CAST(2 AS BIGINT) AS rn, b.day, b.x,
             b.x AS l, b.x - a.x AS tr, CAST(NULL AS DOUBLE) AS fitted
      FROM rn a JOIN rn b ON a.rn = 1 AND b.rn = 2
      UNION ALL
      SELECT n.rn, n.day, n.x,
             {relational.HOLT_ALPHA} * n.x
               + {1 - relational.HOLT_ALPHA} * (r.l + r.tr) AS l,
             {relational.HOLT_BETA}
               * (({relational.HOLT_ALPHA} * n.x
                   + {1 - relational.HOLT_ALPHA} * (r.l + r.tr)) - r.l)
               + {1 - relational.HOLT_BETA} * r.tr AS tr,
             r.l + r.tr AS fitted
      FROM rec r JOIN rn n ON n.rn = r.rn + 1
    )
    SELECT day, x, round(l, 4) AS level, round(tr, 4) AS trend,
           round(fitted, 4) AS fitted, round(x - fitted, 4) AS resid
    FROM rec WHERE rn >= 3
    """,
    tags=("timeseries", "holt", "recurrence", "iterative"),
)


register(
    "sf_woe_iv_segment",
    relational.woe_iv_segment,
    sql="""
    WITH j AS (
      SELECT c_mktsegment AS segment,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS ev
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), g AS (
      SELECT segment,
             count(*) AS n_orders,
             CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS n_nonevents
      FROM j GROUP BY 1
    ), t AS (
      SELECT *, sum(n_events) OVER () AS te, sum(n_nonevents) OVER () AS tn
      FROM g
    ), s AS (
      SELECT *,
             ln((n_events * 1.0 / te) / (n_nonevents * 1.0 / tn)) AS woe_raw,
             (n_events * 1.0 / te - n_nonevents * 1.0 / tn)
               * ln((n_events * 1.0 / te) / (n_nonevents * 1.0 / tn)) AS iv_raw
      FROM t
    )
    SELECT segment, n_orders, n_events, n_nonevents,
           round(woe_raw, 6) AS woe, round(iv_raw, 6) AS iv_term,
           round(sum(iv_raw) OVER (), 6) AS iv_total
    FROM s
    """,
    tags=("statistics", "woe", "information-value", "feature-audit"),
)


# same md5 arm gate and the SAME shared A&S erfc polynomial string as
# the Spark side (relational.PVAL_TT_EXPR / PVAL_EXPR over az/tt)
register(
    "sf_ab_srm_audit",
    relational.ab_srm_audit,
    sql=f"""
    WITH users AS (
      SELECT DISTINCT user_id FROM events
    ), arms AS (
      SELECT CASE WHEN CAST(CONCAT('0x',
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % {relational.SRM_ARMS} = 0
             THEN 'A' ELSE 'B' END AS arm
      FROM users
    ), g AS (
      SELECT arm, count(*) AS n_users FROM arms GROUP BY arm
    ), t AS (
      SELECT *, sum(n_users) OVER () AS n_total,
             sum(n_users) OVER () / {float(relational.SRM_ARMS)} AS expected
      FROM g
    ), c AS (
      SELECT *,
             sum(pow(n_users - expected, 2) / expected) OVER () AS chi2_raw
      FROM t
    ), z AS (
      SELECT *, sqrt(chi2_raw) / sqrt(2.0) AS az FROM c
    ), z2 AS (
      SELECT *, {relational.PVAL_TT_EXPR} AS tt FROM z
    )
    SELECT arm, n_users, CAST(n_total AS BIGINT) AS n_total,
           round(expected, 2) AS expected,
           round(chi2_raw, 6) AS chi2,
           round({relational.PVAL_EXPR}, 6) AS p_value,
           {relational.PVAL_EXPR} < {relational.SRM_ALPHA} AS srm_detected
    FROM z2
    """,
    tags=("statistics", "ab-testing", "srm", "chi-square"),
)


# identical inverse-CDF Laplace transform from the identical md5-seeded
# uniform; epsilon/sensitivity interpolated from the module constants
register(
    "dp_noisy_event_counts",
    relational.dp_noisy_event_counts,
    sql=f"""
    WITH g AS (
      SELECT event_type, count(*) AS n_true FROM events GROUP BY 1
    ), k AS (
      SELECT *,
             (CAST(CAST(CONCAT('0x', substr(md5(CAST(event_type AS VARCHAR)),
                                       1, 8)) AS BIGINT)
                   % {relational.DP_SEED_BUCKETS} AS DOUBLE) + 0.5)
               / {float(relational.DP_SEED_BUCKETS)} AS u
      FROM g
    ), n AS (
      SELECT *,
             -{relational.DP_SENSITIVITY / relational.DP_EPSILON}
               * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise_raw
      FROM k
    )
    SELECT event_type, n_true,
           round(noise_raw, 6) AS noise,
           round(n_true + noise_raw, 6) AS n_noisy,
           {relational.DP_EPSILON} AS epsilon
    FROM n
    """,
    tags=("privacy", "differential-privacy", "laplace"),
)


# identical equal-width binning from scalar-subquery min/max; ln() of
# exact integer counts so the top-k ordering is engine-total
register(
    "dq_hbos_outliers",
    relational.hbos_outliers,
    sql=f"""
    WITH f AS (
      SELECT o_orderkey, o_totalprice AS price,
             CAST(n_items AS DOUBLE) AS n_items
      FROM orders JOIN (
        SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY 1
      ) li ON o_orderkey = l_orderkey
    ), mm AS (
      SELECT min(price) AS p0, max(price) AS p1,
             min(n_items) AS i0, max(n_items) AS i1
      FROM f
    ), b AS (
      SELECT o_orderkey,
             CAST(least(floor((price - mm.p0) / (mm.p1 - mm.p0)
                              * {float(relational.HBOS_BINS)}),
                        {relational.HBOS_BINS - 1}) AS BIGINT) AS bin_price,
             CAST(least(floor((n_items - mm.i0) / (mm.i1 - mm.i0)
                              * {float(relational.HBOS_BINS)}),
                        {relational.HBOS_BINS - 1}) AS BIGINT) AS bin_items
      FROM f, mm
    ), hp AS (
      SELECT bin_price, count(*) AS np, max(count(*)) OVER () AS mp
      FROM b GROUP BY 1
    ), hi AS (
      SELECT bin_items, count(*) AS ni, max(count(*)) OVER () AS mi
      FROM b GROUP BY 1
    )
    SELECT b.o_orderkey, b.bin_price, b.bin_items,
           round((ln(hp.mp) - ln(hp.np)) + (ln(hi.mi) - ln(hi.ni)), 6)
             AS hbos_score
    FROM b JOIN hp USING (bin_price) JOIN hi USING (bin_items)
    ORDER BY hbos_score DESC, b.o_orderkey ASC
    LIMIT {relational.HBOS_TOPK}
    """,
    tags=("data-quality", "outliers", "hbos", "histogram"),
)


# identical strong-pair construction as the kcore twin; wedge join +
# known-edge anti-join; AA/Jaccard from exact integer degrees
register(
    "graph_trade_link_prediction",
    graph.trade_link_prediction,
    sql="""
    WITH pairs AS (
      SELECT least(c.c_nationkey, s.s_nationkey) AS a,
             greatest(c.c_nationkey, s.s_nationkey) AS b,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                      AS BIGINT)) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ), kept AS (
      SELECT a, b FROM pairs WHERE w > (SELECT median(w) FROM pairs)
    ), e AS (
      SELECT a AS x, b AS y FROM kept UNION ALL SELECT b, a FROM kept
    ), deg AS (
      SELECT x, count(*) AS d FROM e GROUP BY x
    ), cand AS (
      SELECT e1.y AS u, e2.y AS v,
             count(*) AS cn,
             sum(1.0 / ln(dz.d)) AS aa_raw
      FROM e e1 JOIN e e2 ON e1.x = e2.x AND e1.y < e2.y
      JOIN deg dz ON dz.x = e1.x
      GROUP BY 1, 2
    ), non_edges AS (
      SELECT cand.* FROM cand
      LEFT JOIN kept ON cand.u = kept.a AND cand.v = kept.b
      WHERE kept.a IS NULL
    )
    SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
           CAST(ne.cn AS BIGINT) AS common_neighbors,
           round(ne.cn * 1.0 / (du.d + dv.d - ne.cn), 6) AS jaccard,
           round(ne.aa_raw, 6) AS adamic_adar
    FROM non_edges ne
    JOIN deg du ON du.x = ne.u
    JOIN deg dv ON dv.x = ne.v
    JOIN nation na ON na.n_nationkey = ne.u
    JOIN nation nb ON nb.n_nationkey = ne.v
    """,
    tags=("graph", "link-prediction", "adamic-adar"),
)


# identical cents-rounded value grain, tie-corrected midrank Gini, and
# exact pro-rata boundary split; DuckDB's windows replay the
# distributed two-phase prefix sums
register(
    "sf_gini_topshare_revenue",
    relational.gini_topshare_revenue,
    sql=f"""
    WITH per_cust AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS v
      FROM orders GROUP BY 1
    ), per_value AS (
      SELECT v, count(*) AS cnt FROM per_cust GROUP BY 1
    ), cum AS (
      SELECT v, cnt,
             coalesce(sum(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn_excl,
             coalesce(sum(cnt * v) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cx_excl
      FROM per_value
    ), tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n, sum(cnt * v) AS X FROM per_value
    ), gini AS (
      SELECT 2.0 * sum(cnt * v * (cn_excl + (cnt + 1) / 2.0))
               / (tot.n * tot.X)
             - (tot.n + 1.0) / tot.n AS gini_raw
      FROM cum, tot GROUP BY tot.n, tot.X
    ), ps AS (
      SELECT unnest(ARRAY{list(relational.GINI_SHARES)}) AS p
    ), cuts AS (
      SELECT ps.p, cum.v, cum.cnt, cum.cn_excl, cum.cx_excl, tot.n, tot.X,
             CAST(ceil(ps.p * tot.n / 100.0) AS BIGINT) AS k
      FROM cum, tot, ps
      WHERE (tot.n - cum.cn_excl) >= ceil(ps.p * tot.n / 100.0)
        AND (tot.n - cum.cn_excl - cum.cnt) < ceil(ps.p * tot.n / 100.0)
    )
    SELECT CAST(p AS BIGINT) AS top_pct,
           k AS n_customers,
           round(v, 2) AS cutoff_revenue,
           round(((X - cx_excl) - (n - cn_excl - k) * v) / X, 6)
             AS revenue_share,
           round(gini.gini_raw, 6) AS gini
    FROM cuts, gini
    """,
    tags=("statistics", "gini", "concentration", "prefix-sum"),
)


register(
    "rec_copurchase_topk",
    relational.copurchase_topk,
    sql=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n AS (
      SELECT p, count(*) AS n_ord FROM li GROUP BY 1
    ), cnt AS (
      SELECT a.p AS pa, b.p AS pb, count(*) AS c_ab
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2
    ), sym AS (
      SELECT pa AS part_a, pb AS part_b, c_ab FROM cnt
      UNION ALL
      SELECT pb, pa, c_ab FROM cnt
    ), scored AS (
      SELECT s.part_a, s.part_b, s.c_ab, na.n_ord AS n_a, nb.n_ord AS n_b,
             s.c_ab / sqrt(na.n_ord * nb.n_ord) AS cos_raw
      FROM sym s
      JOIN n na ON na.p = s.part_a
      JOIN n nb ON nb.p = s.part_b
    )
    SELECT part_a, part_b, c_ab, n_a, n_b,
           round(cos_raw, 6) AS cosine, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY part_a
                 ORDER BY cos_raw DESC, part_b ASC) AS rk
      FROM scored
    ) WHERE rk <= {relational.REC_TOPK}
    """,
    tags=("recommender", "collaborative-filtering", "cosine"),
)


# the Holt recursive CTE verbatim, then the naive lag from the rn
# table and the same metric aggregate
register(
    "ts_forecast_backtest",
    relational.forecast_backtest,
    sql=f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             round(sum(value), 2) AS x
      FROM events GROUP BY 1
    ), rn AS (
      SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM daily
    ), rec AS (
      SELECT CAST(2 AS BIGINT) AS rn, b.day, b.x,
             b.x AS l, b.x - a.x AS tr, CAST(NULL AS DOUBLE) AS fitted
      FROM rn a JOIN rn b ON a.rn = 1 AND b.rn = 2
      UNION ALL
      SELECT n.rn, n.day, n.x,
             {relational.HOLT_ALPHA} * n.x
               + {1 - relational.HOLT_ALPHA} * (r.l + r.tr) AS l,
             {relational.HOLT_BETA}
               * (({relational.HOLT_ALPHA} * n.x
                   + {1 - relational.HOLT_ALPHA} * (r.l + r.tr)) - r.l)
               + {1 - relational.HOLT_BETA} * r.tr AS tr,
             r.l + r.tr AS fitted
      FROM rec r JOIN rn n ON n.rn = r.rn + 1
    ), rounded AS (
      SELECT rec.rn, rec.x, round(rec.fitted, 4) AS fitted
      FROM rec WHERE rec.rn >= 3
    ), ev AS (
      SELECT r.x, r.fitted, p.x AS x_prev
      FROM rounded r JOIN rn p ON p.rn = r.rn - 1
      WHERE r.rn >= 4
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(avg(abs(x - fitted)), 6) AS mae_holt,
           round(avg(abs(x - x_prev)), 6) AS mae_naive,
           round(avg(abs(x - fitted)) / avg(abs(x - x_prev)), 6) AS mase,
           round(avg(2.0 * abs(x - fitted) / (abs(x) + abs(fitted))), 6)
             AS smape_holt,
           round(avg(CASE WHEN abs(x - fitted) < abs(x - x_prev)
                          THEN 1.0 ELSE 0.0 END), 6) AS share_beats_naive
    FROM ev
    """,
    tags=("timeseries", "forecast", "backtest", "evaluation"),
)


register(
    "sf_mutual_information",
    relational.mutual_information,
    sql="""
    WITH j AS (
      SELECT c_mktsegment AS a, o_orderpriority AS b
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), g AS (
      SELECT a, b, count(*) AS n_ab FROM j GROUP BY 1, 2
    ), t AS (
      SELECT *,
             sum(n_ab) OVER () AS n,
             sum(n_ab) OVER (PARTITION BY a) AS n_a,
             sum(n_ab) OVER (PARTITION BY b) AS n_b
      FROM g
    ), s AS (
      SELECT *,
             (n_ab * 1.0 / n) * ln(n_ab * 1.0 * n / (n_a * 1.0 * n_b))
               AS mi_term_raw
      FROM t
    ), m AS (
      SELECT *,
             sum(mi_term_raw) OVER () AS mi_raw,
             sum(-(n_ab * 1.0 / n) * ln(n_a * 1.0 / n)) OVER () AS h_a,
             sum(-(n_ab * 1.0 / n) * ln(n_b * 1.0 / n)) OVER () AS h_b
      FROM s
    )
    SELECT a, b, n_ab,
           round(n_ab * 1.0 * n / (n_a * 1.0 * n_b), 6) AS lift,
           round(mi_term_raw, 6) AS mi_term,
           round(mi_raw, 6) AS mi_total,
           round(mi_raw / sqrt(h_a * h_b), 6) AS nmi
    FROM m
    """,
    tags=("statistics", "mutual-information", "dependence"),
)


# exact integer-second lags; purchases strictly at-or-after the
# user's FIRST signup; groupBy(first) collapses to the same s_ts
register(
    "wf_conversion_lag",
    relational.conversion_lag,
    sql="""
    WITH signup AS (
      SELECT user_id, min(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), purch AS (
      SELECT e.user_id, min(e.ts) AS p_ts, min(s.s_ts) AS s_ts2
      FROM events e JOIN signup s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
      GROUP BY e.user_id
    ), lag AS (
      SELECT user_id,
             CAST(floor(date_diff('second', s_ts2, p_ts) / 86400.0)
                  AS BIGINT) AS lag_days
      FROM purch
    ), buckets AS (
      SELECT lag_days, count(*) AS n_converted FROM lag GROUP BY 1
    ), t AS (
      SELECT *, CAST(sum(n_converted) OVER () AS BIGINT) AS total_converted,
             (SELECT CAST(count(*) AS BIGINT) FROM signup) AS n_signups
      FROM buckets
    )
    SELECT lag_days, n_converted, total_converted, n_signups,
           round(total_converted * 1.0 / n_signups, 6) AS conversion_rate
    FROM t
    """,
    tags=("window", "funnel", "conversion-lag"),
)


register(
    "dq_delta_attribution",
    relational.delta_attribution,
    sql=f"""
    WITH j AS (
      SELECT c_mktsegment AS segment,
             o_orderdate >= TIMESTAMP '{relational.ATTR_CUT}' AS p2,
             o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), g AS (
      SELECT segment, p2, count(*) AS n, round(sum(o_totalprice), 2) AS rev
      FROM j GROUP BY 1, 2
    ), wide AS (
      SELECT segment,
             CAST(sum(CASE WHEN NOT p2 THEN n ELSE 0 END) AS BIGINT) AS n1,
             sum(CASE WHEN NOT p2 THEN rev ELSE 0.0 END) AS rev1,
             CAST(sum(CASE WHEN p2 THEN n ELSE 0 END) AS BIGINT) AS n2,
             sum(CASE WHEN p2 THEN rev ELSE 0.0 END) AS rev2
      FROM g GROUP BY segment
    ), d AS (
      SELECT *, rev2 - rev1 AS delta_raw FROM wide
    )
    SELECT segment, n1, n2,
           round(rev1, 2) AS rev1, round(rev2, 2) AS rev2,
           round(delta_raw, 2) AS delta,
           round((n2 - n1) * (rev1 / n1), 2) AS volume_effect,
           round(n2 * (rev2 / n2 - rev1 / n1), 2) AS rate_effect,
           round(delta_raw / sum(delta_raw) OVER (), 6)
             AS share_of_total_delta
    FROM d
    """,
    tags=("data-quality", "attribution", "decomposition"),
)


# same sparsified edge set as the BFS twin; the recursive CTE's UNION
# dedups (v,u,d) tuples so the walk table stays |V|^2 x hops bounded;
# min(d) per pair == first-arrival layering
register(
    "graph_trade_harmonic",
    graph.trade_harmonic_centrality,
    sql=f"""
    WITH RECURSIVE {_TRADE_EDGE_CTE},
    sparse AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY round(w, 2) DESC, dst) AS rk
        FROM e WHERE src <> dst
      ) WHERE rk <= {graph.TOP_EDGES_PER_SRC}
    ), walk(v, u, d) AS (
      SELECT n_nationkey, n_nationkey, 0 FROM nation
      UNION
      SELECT walk.v, sparse.dst, walk.d + 1
      FROM walk JOIN sparse ON walk.u = sparse.src
      WHERE walk.d < {graph.HARMONIC_HOPS}
    ), md AS (
      SELECT v, u, min(d) AS d FROM walk GROUP BY 1, 2
    ), harm AS (
      SELECT v, CAST(count(*) AS BIGINT) AS n_reachable,
             sum(1.0 / d) AS h_raw
      FROM md WHERE d > 0 GROUP BY v
    )
    SELECT n_name,
           coalesce(harm.n_reachable, 0) AS n_reachable,
           round(coalesce(harm.h_raw, 0.0), 6) AS harmonic,
           round(coalesce(harm.h_raw, 0.0)
                 / (SELECT count(*) - 1.0 FROM nation), 6)
             AS harmonic_normalized
    FROM nation LEFT JOIN harm ON n_nationkey = harm.v
    """,
    tags=("graph", "centrality", "bfs", "iterative", "recursive-cte"),
)


# epoch-anchored integer weeks; per-cell cents rounding BEFORE the
# cumulative sum so both engines accumulate identical values
register(
    "wf_cohort_ltv_triangle",
    relational.cohort_ltv_triangle,
    sql="""
    WITH signup AS (
      SELECT user_id, min(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), cohorts AS (
      SELECT user_id, s_ts,
             CAST(floor(epoch(s_ts) / 604800.0) AS BIGINT) AS cohort_week
      FROM signup
    ), sizes AS (
      SELECT cohort_week, count(*) AS n_users FROM cohorts GROUP BY 1
    ), cell AS (
      SELECT c.cohort_week,
             CAST(floor(date_diff('second', c.s_ts, e.ts) / 604800.0)
                  AS BIGINT) AS weeks_since,
             round(sum(e.value), 2) AS rev
      FROM events e JOIN cohorts c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.s_ts
      GROUP BY 1, 2
    ), cum AS (
      SELECT *, sum(rev) OVER (PARTITION BY cohort_week ORDER BY weeks_since
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
      FROM cell
    )
    SELECT c.cohort_week, c.weeks_since, s.n_users,
           round(c.rev, 2) AS week_revenue,
           round(c.cum_rev, 2) AS cum_revenue,
           round(c.cum_rev / s.n_users, 6) AS cum_ltv_per_user
    FROM cum c JOIN sizes s USING (cohort_week)
    """,
    tags=("window", "cohort", "ltv"),
)


# Holt recursive CTE + the same two exact medians; duckdb's median()
# interpolates the middle pair exactly like Spark's percentile(0.5)
register(
    "ts_holt_anomaly_days",
    relational.holt_anomaly_days,
    sql=f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             round(sum(value), 2) AS x
      FROM events GROUP BY 1
    ), rn AS (
      SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM daily
    ), rec AS (
      SELECT CAST(2 AS BIGINT) AS rn, b.day, b.x,
             b.x AS l, b.x - a.x AS tr, CAST(NULL AS DOUBLE) AS fitted
      FROM rn a JOIN rn b ON a.rn = 1 AND b.rn = 2
      UNION ALL
      SELECT n.rn, n.day, n.x,
             {relational.HOLT_ALPHA} * n.x
               + {1 - relational.HOLT_ALPHA} * (r.l + r.tr) AS l,
             {relational.HOLT_BETA}
               * (({relational.HOLT_ALPHA} * n.x
                   + {1 - relational.HOLT_ALPHA} * (r.l + r.tr)) - r.l)
               + {1 - relational.HOLT_BETA} * r.tr AS tr,
             r.l + r.tr AS fitted
      FROM rec r JOIN rn n ON n.rn = r.rn + 1
    ), h AS (
      SELECT CAST(day AS TIMESTAMP) AS day, x,
             round(fitted, 4) AS fitted,
             round(x - fitted, 4) AS resid
      FROM rec WHERE rn >= 3
    ), med AS (
      SELECT median(resid) AS med FROM h
    ), mad AS (
      SELECT median(abs(resid - med.med)) AS mad FROM h, med
    )
    SELECT h.day, h.x, h.fitted, h.resid,
           round((h.resid - med.med)
                 / ({relational.MAD_SIGMA} * mad.mad), 4) AS robust_z,
           abs((h.resid - med.med) / ({relational.MAD_SIGMA} * mad.mad))
             > {relational.ANOM_K_MAD} AS is_anomaly
    FROM h, med, mad
    """,
    tags=("timeseries", "anomaly", "robust", "holt"),
)


# same membership amplification as ts_rolling_distinct_users, with
# the 28-day window and the dau/mau ratio
register(
    "wf_dau_mau_stickiness",
    relational.dau_mau_stickiness,
    sql=f"""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM days GROUP BY day
    ), contrib AS (
      SELECT user_id, day + CAST(i AS INT) AS win_day
      FROM days, range(0, {relational.MAU_WINDOW_DAYS}) r(i)
    ), mau AS (
      SELECT c.win_day, CAST(count(DISTINCT c.user_id) AS BIGINT) AS mau
      FROM contrib c JOIN dau p ON c.win_day = p.day
      GROUP BY c.win_day
    )
    SELECT CAST(dau.day AS TIMESTAMP) AS day, dau.dau, mau.mau,
           round(dau.dau * 1.0 / mau.mau, 6) AS stickiness
    FROM dau JOIN mau ON dau.day = mau.win_day
    """,
    tags=("window", "engagement", "rolling-distinct"),
)


def _cm_sql() -> str:
    """Identical salted-md5 cells and min-over-rows estimates."""
    from .operators import sketches as sk

    rows_cells = " UNION ALL ".join(
        f"SELECT {r} AS row, CAST(CONCAT('0x', substr(md5(CONCAT('cm{r}|', w)),"
        f" 1, 8)) AS BIGINT) % {sk.CM_WIDTH} AS bucket, c FROM words"
        for r in range(sk.CM_DEPTH)
    )
    rows_lkp = " UNION ALL ".join(
        f"SELECT w, true_count, {r} AS row, CAST(CONCAT('0x',"
        f" substr(md5(CONCAT('cm{r}|', w)), 1, 8)) AS BIGINT)"
        f" % {sk.CM_WIDTH} AS bucket FROM top"
        for r in range(sk.CM_DEPTH)
    )
    return f"""
    WITH words AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
      ) WHERE w <> '' GROUP BY w
    ), cells AS ({rows_cells}),
    cm AS (
      SELECT row, bucket, sum(c) AS cell FROM cells GROUP BY 1, 2
    ), top AS (
      SELECT w, c AS true_count FROM words
      ORDER BY c DESC, w ASC LIMIT {sk.CM_TOPK}
    ), lkp AS ({rows_lkp})
    SELECT l.w, CAST(l.true_count AS BIGINT) AS true_count,
           CAST(min(cm.cell) AS BIGINT) AS cm_estimate,
           CAST(min(cm.cell) - l.true_count AS BIGINT) AS overestimate,
           min(cm.cell) >= l.true_count AS never_under
    FROM lkp l JOIN cm USING (row, bucket)
    GROUP BY l.w, l.true_count
    """


from .operators import sketches as _sk  # noqa: E402

register(
    "sketch_countmin_words",
    _sk.countmin_words,
    sql=_cm_sql(),
    tags=("sketch", "count-min", "frequency"),
)


register(
    "sf_theil_decomposition",
    relational.theil_decomposition,
    sql="""
    WITH per AS (
      SELECT c_mktsegment AS segment, round(sum(o_totalprice), 2) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_custkey
    ), g AS (
      SELECT segment, count(*) AS n_g, sum(x) AS x_g,
             sum(x * ln(x)) AS sxlx_g
      FROM per GROUP BY segment
    ), t AS (
      SELECT *, sum(n_g) OVER () AS n, sum(x_g) OVER () AS X FROM g
    ), s AS (
      SELECT *,
             x_g / X AS s_g,
             sxlx_g / x_g - ln(x_g / n_g) AS t_g,
             (x_g / X) * ln((x_g / n_g) / (X / n)) AS between_term
      FROM t
    )
    SELECT segment,
           CAST(n_g AS BIGINT) AS n_customers,
           round(s_g, 6) AS revenue_share,
           round(t_g, 6) AS theil_within_group,
           round(s_g * t_g, 6) AS within_contribution,
           round(between_term, 6) AS between_contribution,
           round(sum(s_g * t_g) OVER (), 6) AS t_within,
           round(sum(between_term) OVER (), 6) AS t_between,
           round(sum(s_g * t_g) OVER () + sum(between_term) OVER (), 6)
             AS t_total
    FROM s
    """,
    tags=("statistics", "theil", "inequality", "decomposition"),
)


# identical lower-median, identical deviation moments, and the same
# closed-form chi2(4) survival for the large-df2 approximation
register(
    "sf_brown_forsythe_value",
    relational.brown_forsythe_value,
    sql=f"""
    WITH x AS (
      SELECT event_type AS g, round(value, 2) AS v FROM events
    ), ranked AS (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY g) AS n_g
      FROM x
    ), med AS (
      SELECT g, v AS med FROM ranked
      WHERE rn = CAST(ceil(n_g / 2.0) AS BIGINT)
    ), z AS (
      SELECT x.g, abs(x.v - med.med) AS z
      FROM x JOIN med ON x.g = med.g
    ), gm AS (
      SELECT g, count(*) AS n_g, avg(z) AS zbar_g, sum(z * z) AS szz_g
      FROM z GROUP BY g
    ), t AS (
      SELECT *,
             sum(n_g) OVER () AS N,
             count(*) OVER () AS k_groups,
             sum(zbar_g * n_g) OVER () / sum(n_g) OVER () AS zbar
      FROM gm
    ), s AS (
      SELECT *,
             (N - k_groups) * 1.0 / (k_groups - 1)
               * sum(n_g * pow(zbar_g - zbar, 2)) OVER ()
               / sum(szz_g - n_g * zbar_g * zbar_g) OVER () AS W_raw
      FROM t
    )
    SELECT g AS event_type, CAST(n_g AS BIGINT) AS n,
           round(zbar_g, 6) AS mean_abs_dev,
           round(W_raw, 6) AS bf_statistic,
           CAST(k_groups - 1 AS BIGINT) AS df1,
           CAST(N - k_groups AS BIGINT) AS df2,
           round(exp(-((k_groups - 1) * W_raw) / 2)
                 * (1 + ((k_groups - 1) * W_raw) / 2), 6) AS p_approx
    FROM s
    """,
    tags=("statistics", "variance-test", "brown-forsythe", "prefix-sum"),
)


register(
    "wf_new_vs_returning",
    relational.new_vs_returning,
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), first AS (
      SELECT user_id, min(day) AS first_day FROM days GROUP BY 1
    ), tagged AS (
      SELECT d.day, d.day = f.first_day AS is_new
      FROM days d JOIN first f ON d.user_id = f.user_id
    ), g AS (
      SELECT day,
             CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
             CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT)
               AS returning_users
      FROM tagged GROUP BY day
    )
    SELECT CAST(day AS TIMESTAMP) AS day, new_users, returning_users,
           new_users + returning_users AS dau,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS acquired_to_date,
           round(new_users * 1.0 / (new_users + returning_users), 6)
             AS new_share
    FROM g
    """,
    tags=("window", "engagement", "growth-accounting"),
)


register(
    "graph_trade_assortativity",
    graph.trade_assortativity,
    sql="""
    WITH pairs AS (
      SELECT least(c.c_nationkey, s.s_nationkey) AS a,
             greatest(c.c_nationkey, s.s_nationkey) AS b,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                      AS BIGINT)) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ), kept AS (
      SELECT a, b FROM pairs WHERE w > (SELECT median(w) FROM pairs)
    ), e AS (
      SELECT a AS x, b AS y FROM kept UNION ALL SELECT b, a FROM kept
    ), deg AS (
      SELECT x, count(*) AS d FROM e GROUP BY x
    ), de AS (
      SELECT dx.d AS dx, dy.d AS dy
      FROM e JOIN deg dx ON e.x = dx.x JOIN deg dy ON e.y = dy.x
    ), m AS (
      SELECT count(*) AS m, avg(dx) AS mx, avg(dy) AS my,
             avg(dx * dy) AS mxy, avg(dx * dx) AS mxx, avg(dy * dy) AS myy
      FROM de
    )
    SELECT CAST(m AS BIGINT) AS n_directed_edges,
           round(mx, 6) AS mean_deg,
           round((mxy - mx * my)
                 / sqrt((mxx - mx * mx) * (myy - my * my)), 6)
             AS assortativity
    FROM m
    """,
    tags=("graph", "assortativity", "structure"),
)


# identical 2*pi literal, identical 0-based day index; the period grid
# is an unnest projection over the daily frame
register(
    "ts_periodogram_power",
    relational.periodogram_power,
    sql=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             round(sum(value), 2) AS x
      FROM events GROUP BY 1
    ), centered AS (
      SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS DOUBLE) AS t,
             x - avg(x) OVER () AS xc
      FROM daily
    ), grid AS (
      SELECT t, xc, unnest(ARRAY{list(relational.PGRAM_PERIODS)}) AS period
      FROM centered
    ), g AS (
      SELECT period, count(*) AS n,
             sum(xc * cos({relational.PGRAM_TWO_PI} * t / period)) AS c,
             sum(xc * sin({relational.PGRAM_TWO_PI} * t / period)) AS s,
             sum(xc * xc) AS ss
      FROM grid GROUP BY period
    )
    SELECT CAST(period AS BIGINT) AS period,
           CAST(n AS BIGINT) AS n_days,
           round((c * c + s * s) / n, 4) AS power,
           round(((c * c + s * s) / n) / ss, 6) AS variance_share
    FROM g
    """,
    tags=("timeseries", "periodogram", "frequency-domain"),
)


def _entropy_col_sql(name: str, table: str, expr: str) -> str:
    return f"""
    SELECT '{name}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS entropy_nats,
           round(-sum((c * 1.0 / n) * ln(c * 1.0 / n))
                 / ln(count(*) * 1.0), 6) AS entropy_normalized
    FROM (
      SELECT v, count(*) AS c, sum(count(*)) OVER () AS n
      FROM (SELECT {expr} AS v FROM {table}) GROUP BY v
    )"""


register(
    "dq_column_entropy_profile",
    relational.column_entropy_profile,
    sql=" UNION ALL ".join(
        [
            _entropy_col_sql("o_orderstatus", "orders", "o_orderstatus"),
            _entropy_col_sql("o_orderpriority", "orders", "o_orderpriority"),
            _entropy_col_sql("c_mktsegment", "customer", "c_mktsegment"),
            _entropy_col_sql(
                "c_nationkey", "customer", "CAST(c_nationkey AS VARCHAR)"
            ),
        ]
    ),
    tags=("data-quality", "entropy", "profiling"),
)


register(
    "dq_event_order_audit",
    relational.event_order_audit,
    sql="""
    WITH per AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS fs,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
             min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
             min(CASE WHEN event_type = 'click' THEN ts END) AS fc
      FROM events GROUP BY user_id
    )
    SELECT 'purchase_before_signup' AS check,
           CAST(sum(CASE WHEN fp IS NOT NULL AND fs IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_applicable,
           CAST(sum(CASE WHEN fp IS NOT NULL AND fs IS NOT NULL AND fp < fs
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           round(sum(CASE WHEN fp IS NOT NULL AND fs IS NOT NULL AND fp < fs
                          THEN 1 ELSE 0 END) * 1.0
                 / greatest(sum(CASE WHEN fp IS NOT NULL AND fs IS NOT NULL
                                     THEN 1 ELSE 0 END), 1), 6)
             AS violation_rate
    FROM per
    UNION ALL
    SELECT 'click_before_view',
           CAST(sum(CASE WHEN fc IS NOT NULL AND fv IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN fc IS NOT NULL AND fv IS NOT NULL AND fc < fv
                         THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN fc IS NOT NULL AND fv IS NOT NULL AND fc < fv
                          THEN 1 ELSE 0 END) * 1.0
                 / greatest(sum(CASE WHEN fc IS NOT NULL AND fv IS NOT NULL
                                     THEN 1 ELSE 0 END), 1), 6)
    FROM per
    UNION ALL
    SELECT 'purchase_without_any_signup',
           CAST(sum(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN fp IS NOT NULL AND fs IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN fp IS NOT NULL AND fs IS NULL
                          THEN 1 ELSE 0 END) * 1.0
                 / greatest(sum(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END),
                            1), 6)
    FROM per
    """,
    tags=("data-quality", "integrity", "event-ordering"),
)


register(
    "sf_partial_correlation",
    relational.partial_correlation,
    sql="""
    WITH per AS (
      SELECT CAST(count(*) AS DOUBLE) AS x,
             sum(value) AS y,
             CAST(count(DISTINCT date_trunc('day', ts)) AS DOUBLE) AS z
      FROM events GROUP BY user_id
    ), m AS (
      SELECT count(*) AS n,
             avg(x) AS mx, avg(y) AS my, avg(z) AS mz,
             avg(x * y) AS mxy, avg(x * z) AS mxz, avg(y * z) AS myz,
             avg(x * x) AS mxx, avg(y * y) AS myy, avg(z * z) AS mzz
      FROM per
    ), c AS (
      SELECT n,
             (mxy - mx * my) / sqrt((mxx - mx * mx) * (myy - my * my)) AS rxy,
             (mxz - mx * mz) / sqrt((mxx - mx * mx) * (mzz - mz * mz)) AS rxz,
             (myz - my * mz) / sqrt((myy - my * my) * (mzz - mz * mz)) AS ryz
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(rxy, 6) AS r_xy,
           round(rxz, 6) AS r_xz,
           round(ryz, 6) AS r_yz,
           round((rxy - rxz * ryz)
                 / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
             AS r_xy_given_z
    FROM c
    """,
    tags=("statistics", "partial-correlation", "confounding"),
)


register(
    "ts_max_drawdown",
    relational.max_drawdown,
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             round(sum(value), 2) AS x
      FROM events GROUP BY 1
    ), c0 AS (
      SELECT day,
             sum(x) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM daily
    ), c AS (
      SELECT day, cum,
             max(cum) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM c0
    ), dd AS (
      SELECT *, peak - cum AS drawdown FROM c
    ), trough AS (
      SELECT * FROM dd
      ORDER BY round(drawdown, 2) DESC, day ASC LIMIT 1
    ), pk AS (
      SELECT min(dd.day) AS peak_day
      FROM dd, trough WHERE dd.cum = trough.peak
    )
    SELECT CAST(pk.peak_day AS TIMESTAMP) AS peak_day,
           CAST(trough.day AS TIMESTAMP) AS trough_day,
           round(trough.peak, 2) AS peak_cum,
           round(trough.cum, 2) AS trough_cum,
           round(trough.drawdown, 2) AS max_drawdown,
           round(trough.drawdown / trough.peak, 6) AS drawdown_frac
    FROM trough, pk
    """,
    tags=("timeseries", "drawdown", "risk"),
)


register(
    "graph_trade_reciprocity",
    graph.trade_reciprocity,
    sql="""
    WITH e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                      AS BIGINT)) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ), j AS (
      SELECT a.src, a.dst, a.w, b.w AS w_rev
      FROM e a LEFT JOIN e b ON a.src = b.dst AND a.dst = b.src
    )
    SELECT CAST(count(*) AS BIGINT) AS n_directed_edges,
           CAST(sum(CASE WHEN w_rev IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reciprocated,
           round(sum(CASE WHEN w_rev IS NOT NULL THEN 1.0 ELSE 0.0 END)
                 / count(*), 6) AS edge_reciprocity,
           round(sum(least(w, coalesce(w_rev, 0))) * 1.0 / sum(w), 6)
             AS weighted_reciprocity
    FROM j
    """,
    tags=("graph", "reciprocity", "directionality"),
)


# --- round 7: physical-layout introspection (stdlib parquet footer) ---

from .sources.parquet_footer import FOOTER_STATS_SQL, footer_column_stats  # noqa: E402

register(
    "dq_parquet_footer_stats",
    footer_column_stats,
    sql=FOOTER_STATS_SQL,
    tags=("dq", "parquet", "footer", "metadata"),
)

# round 11 (VERDICT r10 ask #5): the PAGE index — ColumnIndex/
# OffsetIndex walked from parquet-mr's own bytes, page-level min/max
# pruning replayed and verified two-sided against a pyarrow row read;
# the 100 TB scan-pruning lever below row-group stats.
from .sources.parquet_footer import (  # noqa: E402
    PAGE_INDEX_STATS_SQL,
    page_index_stats,
)

register(
    "dq_parquet_page_index_stats",
    page_index_stats,
    sql=PAGE_INDEX_STATS_SQL,
    tags=("dq", "parquet", "page-index", "pruning", "metadata"),
)

# round 11 bonus: the bloom-filter pruning tier — split-block blooms
# (xxhash64, BlockSplitBloomFilter) decoded from parquet-mr's bytes,
# probed for every present distinct value (no false negatives) and a
# fixed absent set (majority excluded); the point-predicate skip lever
# min/max bounds cannot provide on high-cardinality ids.
from .sources.parquet_footer import (  # noqa: E402
    BLOOM_PROBE_STATS_SQL,
    bloom_probe_stats,
)

register(
    "dq_parquet_bloom_probe_stats",
    bloom_probe_stats,
    sql=BLOOM_PROBE_STATS_SQL,
    tags=("dq", "parquet", "bloom-filter", "pruning", "metadata"),
)

# round 11 bonus: RESTORE — rollback as a forward commit (the undone
# version stays time-travelable; restored rows serve through the
# ORIGINAL files, pinned by the same_files_as_v1 structural flag).
from .sources.delta_log import (  # noqa: E402
    DELTA_RESTORE_SQL,
    delta_restore,
)

register(
    "s_delta_restore",
    delta_restore,
    sql=DELTA_RESTORE_SQL,
    tags=("source", "delta", "restore", "time-travel"),
)

# round 11 bonus: ADD-COLUMN schema evolution — a metadata-only
# widening; pre-widening files serve NULL for the new column because
# the reader scans with the CURRENT metadata schema, never file
# inference.
from .sources.delta_log import (  # noqa: E402
    DELTA_SCHEMA_EVOLUTION_SQL,
    delta_schema_evolution,
)

register(
    "s_delta_schema_evolution",
    delta_schema_evolution,
    sql=DELTA_SCHEMA_EVOLUTION_SQL,
    tags=("source", "delta", "schema-evolution"),
)


# --- round 7: Delta-log table semantics over parquet files ---

from .sources.delta_log import (  # noqa: E402
    DELTA_CDF_CHANGES_SQL,
    DELTA_CHECKPOINT_REPLAY_SQL,
    DELTA_CM_ID_MODE_SQL,
    DELTA_CM_PARTITIONED_SQL,
    DELTA_COLUMN_MAPPING_SQL,
    DELTA_DELETION_VECTORS_SQL,
    DELTA_DV_SIDECAR_SQL,
    DELTA_PARTITION_PRUNE_SQL,
    DELTA_TIME_TRAVEL_SQL,
    delta_cdf_changes,
    delta_checkpoint_replay,
    delta_cm_id_mode,
    delta_cm_partitioned,
    delta_column_mapping,
    delta_deletion_vectors,
    delta_dv_sidecar,
    delta_partition_prune,
    delta_time_travel,
)

register(
    "s_delta_time_travel",
    delta_time_travel,
    sql=DELTA_TIME_TRAVEL_SQL,
    tags=("source", "delta", "time-travel", "lakehouse"),
)

# round 8 (VERDICT r7 ask #3): checkpoint + _last_checkpoint pointer —
# replay cost O(tail) with the covered JSON commits EXPIRED, so these
# hashes prove the checkpoint state itself, not a silent JSON fallback.
register(
    "s_delta_checkpoint_replay",
    delta_checkpoint_replay,
    sql=DELTA_CHECKPOINT_REPLAY_SQL,
    tags=("source", "delta", "checkpoint", "lakehouse"),
)

# round 8 (VERDICT r7 ask #3): CDF-style incremental scan — the oracle
# replays each commit's set-difference row definition.
register(
    "s_delta_cdf_changes",
    delta_cdf_changes,
    sql=DELTA_CDF_CHANGES_SQL,
    tags=("source", "delta", "cdf", "incremental", "lakehouse"),
)

# round 9 (VERDICT r8 ask #7): partitionValues pruning — the log's
# actual 100 TB scale lever: files of unselected partitions are never
# listed, and the pruning ratio rides along as audited columns.
register(
    "s_delta_partition_prune",
    delta_partition_prune,
    sql=DELTA_PARTITION_PRUNE_SQL,
    tags=("source", "delta", "partition-pruning", "lakehouse"),
)

# round 9: deletion vectors — row-level deletes with ZERO data-file
# rewrites (inline Z85 roaring bitmaps applied at scan time via the
# native parquet _metadata.row_index), closing the log's last
# disclosed v2-reader gap.
register(
    "s_delta_deletion_vectors",
    delta_deletion_vectors,
    sql=DELTA_DELETION_VECTORS_SQL,
    tags=("source", "delta", "deletion-vectors", "lakehouse"),
)

# round 9: column mapping (name mode) — logical->physical name
# indirection makes column RENAMES metadata-only commits; v2 serves
# the same bytes under the renamed logical column.
register(
    "s_delta_column_mapping",
    delta_column_mapping,
    sql=DELTA_COLUMN_MAPPING_SQL,
    tags=("source", "delta", "column-mapping", "lakehouse"),
)

# round 10 (VERDICT r9 ask #2): DV SIDECAR storage — "u" descriptors,
# one shared deletion_vector_{uuid}.bin (version byte + BE size + CRC
# framing per PROTOCOL.md); data files byte-identical.
register(
    "s_delta_dv_sidecar",
    delta_dv_sidecar,
    sql=DELTA_DV_SIDECAR_SQL,
    tags=("source", "delta", "deletion-vectors", "sidecar", "lakehouse"),
)

# round 10 (VERDICT r9 ask #2): id-mode column mapping — the data
# files carry foreign column names; parquet FIELD IDS resolve through
# Spark's native fieldId.read path; rename stays metadata-only.
register(
    "s_delta_cm_id_mode",
    delta_cm_id_mode,
    sql=DELTA_CM_ID_MODE_SQL,
    tags=("source", "delta", "column-mapping", "field-id", "lakehouse"),
)

# round 10 (VERDICT r9 ask #2): the partitioned × column-mapping
# combination (refused through r9) — partitionValues key by PHYSICAL
# name; logical-filter pruning re-resolves across a partition-column
# rename.
register(
    "s_delta_cm_partitioned",
    delta_cm_partitioned,
    sql=DELTA_CM_PARTITIONED_SQL,
    tags=("source", "delta", "column-mapping", "partition-pruning"),
)

# round 10: OPTIMIZE/compaction — 16 small files rewritten as 2 sorted
# files under dataChange=false, so the commit serves identical data
# AND stays out of the change feed (a true-flagged compaction would
# re-emit the whole table to every incremental consumer).
from .sources.delta_log import (  # noqa: E402
    DELTA_OPTIMIZE_COMPACTION_SQL,
    delta_optimize_compaction,
)

register(
    "s_delta_optimize_compaction",
    delta_optimize_compaction,
    sql=DELTA_OPTIMIZE_COMPACTION_SQL,
    tags=("source", "delta", "optimize", "compaction", "cdf"),
)

# round 11 (VERDICT r10 ask #3): the last two names on the delta
# writer's disclosed v2 list — CHECK constraints enforced at commit
# (violating append refused whole, log untouched) and generated
# columns materialized/verified per delta.generationExpression.
from .sources.delta_log import (  # noqa: E402
    DELTA_CHECK_CONSTRAINTS_SQL,
    delta_check_constraints,
)

register(
    "s_delta_check_constraints",
    delta_check_constraints,
    sql=DELTA_CHECK_CONSTRAINTS_SQL,
    tags=("source", "delta", "constraints", "generated-columns"),
)
