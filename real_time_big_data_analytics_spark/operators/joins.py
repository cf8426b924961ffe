"""J-series joins (SURVEY.md §2.4).

The reference contains no joins — it keeps training features and
streamed records positionally parallel (reference
ConsumerESFinal.scala:53-56,70-83). The rebuild provides the baseline
join surface over the harness star schema.

Scale notes
-----------
Dimension tables (region/nation/customer/supplier/part) are broadcast
explicitly: at 100 TB the fact tables (lineitem/orders/events) shuffle
for nothing if Catalyst falls back to sort-merge, so we pin
``F.broadcast`` on every dimension side. Fact-fact joins
(lineitem⋈orders) stay sort-merge/shuffled-hash on the join key — at
scale both sides would be bucketed by orderkey to make this
shuffle-free; AQE handles skew splitting either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import round2
from ..sources.tables import load_table


def revenue_by_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — equi inner join (dimension enrichment): orders ⋈ customer."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            round2(F.sum("o_totalprice")).alias("total_revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def revenue_by_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — multi-way chain join lineitem⋈orders⋈customer⋈nation⋈region.

    One shuffle join (lineitem⋈orders on orderkey) + three broadcast
    joins; the aggregation then shuffles only (nation × region)
    cardinality rows. This is the plan shape that survives 100×
    scale-up: fact-fact on the key, dims broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_name", "r_name", revenue)
        .groupBy("n_name", "r_name")
        .agg(round2(F.sum("rev")).alias("revenue"), F.count("*").alias("n_items"))
    )


def orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (left outer) — per-customer order count including zero-order
    customers (the rows an inner join would drop)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def customers_with_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (left semi) — EXISTS: customers having ≥1 URGENT order, per nation."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )


def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (left anti) — NOT EXISTS: customers with no URGENT order."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"), round2(F.sum("c_acctbal")).alias("acctbal"))
    )


def top_orders_by_revenue(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3-style: top-k BUILDING-segment orders by lineitem revenue.

    Ranking happens on the *rounded* revenue with the order key as
    tiebreak so the top-k cut is deterministic across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(k)
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — lineitem ⋈ part (broadcast), conditional
    aggregate: the promo share of revenue in one shipdate month.

    The date predicate pushes to the lineitem scan before the join;
    part is a broadcast dim, so the whole query is one scan + one
    map-side join + a single-row aggregate — no fact shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    ).join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        round2(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev)
        ).alias("promo_share_pct"),
        F.count("*").alias("n_items"),
    )


def supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-series — lineitem ⋈ supplier ⋈ nation: revenue by the
    supplier's nation (the supplier-side dimension chain, closing
    coverage of every star-schema table)."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("supp_nation"), rev)
        .groupBy("supp_nation")
        .agg(round2(F.sum("rev")).alias("revenue"), F.count("*").alias("n_items"))
    )


def volume_shipping(
    spark: SparkSession, sf_dir: str, n1: str = "NATION_1", n2: str = "NATION_2"
) -> DataFrame:
    """TPC-H Q7 shape — two-nation volume shipping: revenue flowing
    between a nation pair (either direction), by supplier nation ×
    customer nation × ship year.

    Scale plan: the nation filter is applied INSIDE each broadcast
    dimension (supplier→nation, customer→nation), so both fact tables
    are reduced to ~2/25 of their rows by map-side broadcast joins
    BEFORE the one fact-fact shuffle on orderkey. The literal SQL form
    (join everything, filter the OR-pair at the end) would shuffle the
    full lineitem and orders tables first.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    nation_pair = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(n1, n2)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation_pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation_pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li_n = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    ord_n = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li_n.join(ord_n, li_n.l_orderkey == ord_n.o_orderkey)
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(round2(F.sum(rev)).alias("revenue"), F.count("*").alias("n_items"))
    )


def large_volume_orders(spark: SparkSession, sf_dir: str, threshold: float = 300.0) -> DataFrame:
    """TPC-H Q18 shape — IN-subquery with HAVING: orders whose total
    lineitem quantity exceeds a threshold, enriched with the customer.

    Instead of decorrelating an IN-subquery that re-scans lineitem,
    the plan aggregates lineitem ONCE (partial map-side sum, one
    shuffle on orderkey) and reuses that aggregate both as the filter
    and as the output `sum_qty` — half the fact-table work of the
    literal SQL. The surviving order set is tiny (threshold is far in
    the tail), so the joins back to orders/customer are broadcasts
    at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > threshold)
        .select("l_orderkey", round2(F.col("raw_qty")).alias("sum_qty"))
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def high_balance_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar subquery + NOT EXISTS: customers with
    above-average balance and no orders since 2001, per nation.

    The scalar average is a one-row aggregate broadcast into a
    cross join (no correlated re-scan); the NOT EXISTS is a left-anti
    join from the small filtered customer side against orders. At
    100 TB the anti join shuffles on custkey — both sides would be
    bucketed by custkey to skip it.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= "2001-01-01")
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            round2(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


def returned_item_customers(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape — top-k customers by revenue lost to returned
    items in one quarter.

    The returnflag filter pushes to the lineitem scan, the order-date
    filter to the orders scan; their join shuffles only the filtered
    quarters. Customer/nation broadcast. TakeOrdered computes the
    global top-k without a full sort.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(round2(F.sum(rev)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — the supplier(s) achieving the maximum
    quarterly revenue (the CREATE VIEW + scalar MAX subquery form).

    The per-supplier revenue aggregate is computed ONCE and reused
    for both the max (a one-row aggregate broadcast into the join)
    and the final match — no correlated re-scan of lineitem. Matching
    on the 2-decimal rounded revenue keeps the float comparison
    engine-portable.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    by_supp = li.groupBy("l_suppkey").agg(round2(F.sum(rev)).alias("total_revenue"))
    max_rev = by_supp.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        by_supp.join(
            F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue")
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — revenue from lineitems whose supplier and
    ordering customer share a nation, per nation and year.

    The supplier⋈customer nation equality is NOT a join key anywhere
    — it becomes a post-join filter comparing two broadcast-provided
    columns. Fact-fact (lineitem⋈orders) stays the only shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(round2(F.sum(rev)).alias("revenue"), F.count("*").alias("n_items"))
    )


def national_market_share(
    spark: SparkSession, sf_dir: str, nation: str = "NATION_3", region: str = "ASIA"
) -> DataFrame:
    """TPC-H Q8 shape — one nation's market share of STANDARD-part
    revenue sold into one region, per order year: a conditional
    aggregate (share = sum(case)/sum) over a six-table join.

    Selective dims shrink the fact side first: part (type filter) and
    the region-restricted customer set broadcast against lineitem /
    orders, so the only shuffle is lineitem⋈orders on orderkey. The
    supplier-nation CASE rides the rows into the final tiny
    per-year aggregate — no second pass for the denominator.
    """
    region_nations = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(region_nations), F.col("c_nationkey") == F.col("n_nationkey")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            round2(
                F.sum(F.when(F.col("supp_nation") == nation, rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("mkt_share"),
            F.count("*").alias("n_items"),
        )
    )


def discounted_revenue_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — disjunctive OR-of-ANDs predicate across the
    lineitem ⋈ part broadcast join.

    Catalyst splits the disjunction: the part-only branches
    (brand, size) evaluate inside the broadcast build side, the
    lineitem-only conjuncts weaken into a pushed
    ``l_quantity BETWEEN 1 AND 30`` range filter at the parquet scan
    (the OR of the two quantity windows), and the cross-table residue
    runs post-join. The fact scan therefore skips ~40% of rows before
    any join work — the point of expressing the predicate
    declaratively instead of filtering after the join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size") <= 10)
        & F.col("l_quantity").between(1, 11)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size") <= 25)
        & F.col("l_quantity").between(10, 30)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(branch1 | branch2).agg(
        round2(F.sum(rev)).alias("revenue"), F.count("*").alias("n_items")
    )


def late_shipment_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — correlated EXISTS with a mixed equi+range
    condition: orders in a quarter having any lineitem shipped more
    than 90 days after the order date, counted by priority.

    Catalyst decorrelates the EXISTS into a left-semi join whose
    condition combines the orderkey equality (the shuffle key) with
    the date-range comparison (evaluated post-match, no range-join
    blowup). The date filter on orders pushes to the scan.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — customer order-count distribution: how many
    customers placed exactly k orders (k=0 included via left outer).

    Two aggregations, two shuffles: orders pre-aggregates per custkey
    (map-side partial count, shuffle on custkey), then the left outer
    join keeps order-less customers as count 0, and the second
    aggregate over the tiny (c_count) domain is map-side combinable
    down to a few hundred rows. The orders-side aggregate runs BEFORE
    the join, so the join carries one row per customer, not one per
    order — at 100 TB that is the difference between shuffling the
    fact table and shuffling the customer dimension.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("c_count"))
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str, brand: str = "Brand#4") -> DataFrame:
    """TPC-H Q17 shape — revenue from orders of less than 20% of a
    part's average order quantity, for one brand.

    The correlated scalar subquery (per-part average quantity)
    decorrelates into ONE aggregate pass instead of a re-scan per
    outer row. Scale layout: the brand filter cuts part to ~1/25 and
    broadcasts; the per-part average is computed only over lineitems
    of those parts (part determines brand, so semi-reducing lineitem
    by the broadcast part set FIRST is semantics-preserving and
    shrinks the aggregate's shuffle by the same ~25x). The threshold
    table is part-cardinality — broadcast back against the same
    reduced lineitem slice, so the fact table is scanned once and
    never shuffled on anything but the small partkey aggregate.
    """
    part_b = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part_b.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    thresholds = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    small = li.join(
        F.broadcast(thresholds.withColumnRenamed("l_partkey", "t_partkey")),
        (F.col("l_partkey") == F.col("t_partkey"))
        & (F.col("l_quantity") < F.col("qty_threshold")),
    )
    return small.agg(
        round2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
        F.count("*").alias("n_items"),
    )


def product_profit_by_nation_year(
    spark: SparkSession, sf_dir: str, token: str = "bolt"
) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table in the harness
    schema, so profit omits the supply-cost term) — revenue from
    parts whose name contains a token, by supplier nation and order
    year.

    The name filter shrinks part before its broadcast, semi-reducing
    lineitem at the scan join; supplier⋈nation folds into one small
    broadcast map. The only shuffle left is lineitem⋈orders on
    orderkey to fetch the year, then a tiny (nation, year) aggregate.
    At 100 TB orders/lineitem would be bucketed by orderkey, removing
    that shuffle too.
    """
    part_t = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(token)
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part_t.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(round2(F.sum(rev)).alias("sum_profit"), F.count("*").alias("n_items"))
    )


PRICE_TIERS = [
    ("small", 0.0, 1000.0),
    ("medium", 1000.0, 5000.0),
    ("large", 5000.0, 20000.0),
    ("jumbo", 20000.0, 1e18),
]


def price_tier_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join — each order matched to the price tier whose
    [lo, hi) interval contains its total price, then counted per tier.

    Non-equi joins can't hash-partition, so Spark plans a nested-loop
    scan of fact × bands — fine exactly when the band side is a
    broadcast-sized dimension (here: 4 rows), which is the production
    shape of tier/SLA/bucket classification at any fact-table scale.
    Each fact row scans the tiny band list in the codegen'd join
    condition; no shuffle of the fact table at all. If the band table
    ever grew past broadcast size, the scale path is binning both
    sides to equi-join keys (floor(price / band_width)) first.
    """
    orders = load_table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(PRICE_TIERS, "tier string, lo double, hi double")
    cond = (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    return (
        orders.join(F.broadcast(tiers), cond)
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_orders"),
            round2(F.sum("o_totalprice")).alias("total_price"),
        )
    )


def supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: no partsupp table — the
    part-supplier relation is derived from lineitem's observed
    (partkey, suppkey) pairs) — how many distinct suppliers serve
    each (brand, size) part segment, excluding one brand.

    distinct-aggregate discipline: the pair space is deduped BEFORE
    the count (groupBy partkey+suppkey happens inside
    countDistinct's expand), and the brand filter rides the broadcast
    part side so excluded parts never leave the scan. One fact
    shuffle (on the grouping key after row-side projection), then a
    tiny (brand, size) result.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def waiting_suppliers(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q21 shape (adapted: no receipt/commit dates in the
    harness schema, so "kept the order waiting" = shipped last among
    the suppliers of a multi-supplier order) — top suppliers ranked by
    how many such orders they delayed, with their nation.

    One window pass over lineitem partitioned by orderkey computes
    both the per-order max shipdate and the distinct-supplier count —
    no self-join, no re-scan (the literal SQL's correlated EXISTS /
    NOT EXISTS pair becomes two window aggregates on the same
    shuffle). Supplier/nation broadcast onto the tiny filtered
    result; deterministic tie-break on s_suppkey.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    marked = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w).alias("max_ship"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
    )
    late = (
        marked.filter((F.col("n_supp") > 1) & (F.col("l_shipdate") == F.col("max_ship")))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        late.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name", "numwait", "s_suppkey")
        .orderBy(F.desc("numwait"), F.asc("s_name"), F.asc("s_suppkey"))
        .limit(k)
        .select("s_name", "n_name", "numwait")
    )


def min_cost_supplier(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """TPC-H Q2 shape (adapted: the harness publishes no ``partsupp``
    table, so the supply relation is derived from ``lineitem`` — the
    supply cost of a (part, supplier) pair is its minimum observed
    unit price ``l_extendedprice / l_quantity``).  For small STANDARD
    parts, return each part's cheapest supplier with supplier/nation
    detail, ordered by supplier balance.

    ``min`` (not ``avg``) makes the cost order-independent and
    bit-identical across engines, so the per-part argmin (window
    row_number with a suppkey tie-break) is deterministic.  Plan: one
    shuffle for the (part, supplier) aggregation, one for the per-part
    window — both on KB-scale aggregated data at any SF — with part /
    supplier / nation broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    pf = part.filter((F.col("p_size") < 15) & (F.col("p_type") == "STANDARD"))
    w = Window.partitionBy("l_partkey").orderBy("supply_cost", "l_suppkey")
    cheapest = (
        cost.join(F.broadcast(pf), F.col("l_partkey") == pf.p_partkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        cheapest.join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            round2(F.col("supply_cost")).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"))
        .limit(k)
    )


def important_part_values(
    spark: SparkSession, sf_dir: str, nation_name: str = "NATION_1", fraction: float = 0.001
) -> DataFrame:
    """TPC-H Q11 shape (adapted: part value = discounted revenue from
    ``lineitem`` rows supplied by one nation's suppliers, in place of
    the absent ``partsupp`` stock value).  Keeps parts whose value
    exceeds ``fraction`` of the nation's total — the scalar-subquery-
    in-HAVING pattern.

    The 1-row grand total is computed from the same aggregate and
    broadcast (nested-loop on one row), mirroring how the SQL twin's
    scalar subquery re-reads the CTE; the per-part aggregate shuffles
    once on ``l_partkey``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") == nation_name)
        .select("s_suppkey")
    )
    value = (
        li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("raw_value"))
    )
    total = value.agg((F.sum("raw_value") * fraction).alias("threshold"))
    return (
        value.join(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select("l_partkey", round2(F.col("raw_value")).alias("part_value"))
    )


def late_shipment_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no ``l_shipmode`` / commit / receipt
    dates in the harness schema — ``l_linestatus`` stands in for the
    mode grouping and "late" = shipped more than 30 days after the
    order date).  Conditional aggregation splits high-priority
    (1-URGENT / 2-HIGH) from the rest.

    One fact-fact shuffle join on orderkey (both sides would be
    bucketed by orderkey at scale), then a 2-group aggregate; the
    shipdate range filter is pushed to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def excess_part_suppliers(
    spark: SparkSession, sf_dir: str, name_prefix: str = "red", share: float = 0.5
) -> DataFrame:
    """TPC-H Q20 shape (adapted: "excess availability" = a supplier
    shipped more than ``share`` of a prefix-named part's total 1996
    quantity, replacing the absent ``partsupp.ps_availqty``
    half-of-demand test).  The nested-semi-join pattern survives:
    lineitem → per-(part, supplier) quantity → per-part window total →
    threshold filter → part-name semi join → supplier semi join.

    Quantities are small integers stored as doubles, so the sums and
    the ``share`` threshold are exact in both engines.  The window
    total reuses the groupBy's hash partitioning on ``l_partkey``
    (prefix of the group key), adding no third shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pq = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    excess = (
        pq.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") > share * F.col("part_qty"))
        .join(
            F.broadcast(part.filter(part.p_name.startswith(name_prefix)).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(F.broadcast(excess), supplier.s_suppkey == F.col("l_suppkey"), "semi")
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
