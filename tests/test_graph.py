"""Graph analytics: PageRank invariants (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_analytics_spark.operators import graph


def test_pagerank_invariants(spark, sf_dir):
    ranks = graph.trade_pagerank(spark, sf_dir).collect()
    n = len(ranks)
    assert n > 0
    floor = (1 - graph.DAMPING) / n
    for r in ranks:
        # every node keeps at least the teleport mass
        assert r.rank >= floor - 1e-9, (r.n_name, r.rank)
    total = sum(r.rank for r in ranks)
    # mass is conserved up to dangling-node leakage: never above 1,
    # never below the pure-teleport total
    assert floor * n - 1e-6 <= total <= 1.0 + 1e-6


def test_pagerank_deterministic(spark, sf_dir):
    a = sorted((r.n_name, r.rank) for r in graph.trade_pagerank(spark, sf_dir).collect())
    b = sorted((r.n_name, r.rank) for r in graph.trade_pagerank(spark, sf_dir).collect())
    assert a == b


def test_trade_edges_probabilities_normalized(spark, sf_dir):
    edges = graph.trade_edges(spark, sf_dir)
    outsum = edges.groupBy("src").agg(F.sum("w").alias("tot"))
    rows = outsum.collect()
    assert rows and all(r.tot > 0 for r in rows)


def test_triangles_match_bruteforce(spark, sf_dir):
    from itertools import combinations

    pairs = {
        (r.a, r.b)
        for r in graph._undirected_trade_pairs(spark, sf_dir).collect()
    }
    nodes = sorted({x for p in pairs for x in p})
    per_node = dict.fromkeys(nodes, 0)
    for a, b, c in combinations(nodes, 3):
        if (a, b) in pairs and (b, c) in pairs and (a, c) in pairs:
            for v in (a, b, c):
                per_node[v] += 1
    got = {
        r.n_name: r.n_triangles
        for r in graph.trade_triangles(spark, sf_dir).collect()
    }
    nation = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    assert len(got) == len(nation)
    for k, name in nation.items():
        assert got[name] == per_node.get(k, 0), name


def test_bfs_hops_match_dijkstra_on_hops(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    edges = graph.trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    w = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    sparse = [
        (r.src, r.dst)
        for r in edges.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= graph.TOP_EDGES_PER_SRC)
        .collect()
    ]
    adj = {}
    for s, d in sparse:
        adj.setdefault(s, []).append(d)
    # plain BFS on the driver
    dist = {graph.BFS_SOURCE: 0}
    frontier = [graph.BFS_SOURCE]
    for h in range(1, graph.MAX_HOPS + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    nation = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    got = {
        r.n_name: r.hops for r in graph.trade_bfs_hops(spark, sf_dir).collect()
    }
    assert got == {nation[k]: h for k, h in dist.items()}


def test_label_propagation_invariants(spark, sf_dir):
    """LPA: one row per nation; every community id is some nation's
    node id; propagation is a fixpoint-seeking contraction, so the
    number of distinct communities can only be <= the node count and
    >= 1; re-running is deterministic."""
    from real_time_big_data_analytics_spark.operators.graph import (
        trade_label_propagation,
    )

    rows = trade_label_propagation(spark, sf_dir).collect()
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    n = nation.count()
    assert len(rows) == n
    keys = {r.n_nationkey for r in nation.collect()}
    comms = {r.community for r in rows}
    assert comms <= keys
    assert 1 <= len(comms) <= n
    again = {(r.n_name, r.community) for r in trade_label_propagation(spark, sf_dir).collect()}
    assert again == {(r.n_name, r.community) for r in rows}


def test_kcore_fixpoint_and_invariants(spark, sf_dir):
    """Round KCORE_ROUNDS must already be a fixed point (one more peel
    round changes nothing), every core member must keep >= k strong
    partners INSIDE the core, and the core must be non-trivial."""
    from real_time_big_data_analytics_spark.operators import graph as g

    rows = g.trade_kcore(spark, sf_dir).collect()
    extra = g.trade_kcore(spark, sf_dir, rounds=g.KCORE_ROUNDS + 1).collect()
    assert {(r.n_name, r.in_kcore) for r in rows} == {
        (r.n_name, r.in_kcore) for r in extra
    }
    core = {r.n_name for r in rows if r.in_kcore}
    assert core and len(core) < len(rows)  # non-trivial at harness SFs
    for r in rows:
        if r.in_kcore:
            assert r.degree_strong >= g.KCORE_K  # necessary condition


def test_link_prediction_matches_python_replay(spark, sf_dir):
    """Candidate non-edge pairs and all three scores must equal a
    pure-python replay over the same strong-trade graph, and every
    candidate must genuinely be a non-edge with >= 1 common
    neighbor."""
    import math
    from collections import defaultdict

    from real_time_big_data_analytics_spark.operators import graph
    from real_time_big_data_analytics_spark.sources.tables import load_table

    rows = graph.trade_link_prediction(spark, sf_dir).collect()
    kept = {
        (r.a, r.b)
        for r in graph._strong_trade_pairs(spark, sf_dir).collect()
    }
    name = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    nbr = defaultdict(set)
    for a, b in kept:
        nbr[a].add(b)
        nbr[b].add(a)
    expect = {}
    nodes = sorted(nbr)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) in kept:
                continue
            cn = nbr[u] & nbr[v]
            if not cn:
                continue
            aa = sum(1.0 / math.log(len(nbr[z])) for z in cn)
            jac = len(cn) / (len(nbr[u]) + len(nbr[v]) - len(cn))
            expect[(name[u], name[v])] = (len(cn), jac, aa)
    got = {(r.nation_a, r.nation_b): r for r in rows}
    assert set(got) == set(expect)
    for k, (cn, jac, aa) in expect.items():
        r = got[k]
        assert r.common_neighbors == cn
        assert abs(r.jaccard - jac) < 1e-5
        assert abs(r.adamic_adar - aa) < 1e-5


def test_harmonic_centrality_matches_python_bfs(spark, sf_dir):
    """Harmonic scores must equal a pure-python BFS replay over the
    same sparsified edge set, with 0 <= normalized <= 1."""
    from collections import deque

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_big_data_analytics_spark.functions.numeric import round2
    from real_time_big_data_analytics_spark.operators import graph
    from real_time_big_data_analytics_spark.sources.tables import load_table

    rows = {r.n_name: r for r in graph.trade_harmonic_centrality(spark, sf_dir).collect()}

    edges = graph.trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    w_rank = Window.partitionBy("src").orderBy(
        F.desc(round2(F.col("w"), 2)), F.asc("dst")
    )
    sparse = [
        (r.src, r.dst)
        for r in edges.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= graph.TOP_EDGES_PER_SRC)
        .select("src", "dst")
        .collect()
    ]
    adj = {}
    for s, d in sparse:
        adj.setdefault(s, []).append(d)
    names = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    n = len(names)
    for v in names:
        dist = {v: 0}
        q = deque([v])
        while q:
            x = q.popleft()
            if dist[x] >= graph.HARMONIC_HOPS:
                continue
            for y in adj.get(x, []):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        h = sum(1.0 / d for u, d in dist.items() if d > 0)
        r = rows[names[v]]
        assert r.n_reachable == len(dist) - 1
        assert abs(r.harmonic - h) < 1e-5
        assert abs(r.harmonic_normalized - h / (n - 1)) < 1e-5
        assert 0.0 <= r.harmonic_normalized <= 1.0


def test_assortativity_matches_python_replay(spark, sf_dir):
    """The coefficient must equal a direct python Pearson over the
    same edge-endpoint degree pairs, bounded in [-1, 1], and symmetric
    (the directed expansion makes mx == my exactly)."""
    from collections import Counter

    from real_time_big_data_analytics_spark.operators import graph

    r = graph.trade_assortativity(spark, sf_dir).first()
    kept = [(p.a, p.b) for p in graph._strong_trade_pairs(spark, sf_dir).collect()]
    deg = Counter()
    for a, b in kept:
        deg[a] += 1
        deg[b] += 1
    pairs = [(deg[a], deg[b]) for a, b in kept] + [
        (deg[b], deg[a]) for a, b in kept
    ]
    m = len(pairs)
    mx = sum(x for x, _ in pairs) / m
    my = sum(y for _, y in pairs) / m
    mxy = sum(x * y for x, y in pairs) / m
    mxx = sum(x * x for x, _ in pairs) / m
    myy = sum(y * y for _, y in pairs) / m
    rho = (mxy - mx * my) / ((mxx - mx**2) * (myy - my**2)) ** 0.5
    assert r.n_directed_edges == m
    assert abs(r.mean_deg - mx) < 1e-5
    assert abs(r.assortativity - rho) < 1e-5
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9
    assert abs(mx - my) < 1e-12  # symmetric by construction


def test_reciprocity_matches_python_replay(spark, sf_dir):
    """Reciprocity must equal a dict replay over the engine's own
    integer-cent edge aggregate, with ratios in [0, 1]."""
    from pyspark.sql import functions as F

    from real_time_big_data_analytics_spark.operators import graph
    from real_time_big_data_analytics_spark.sources.tables import load_table

    r = graph.trade_reciprocity(spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("bigint")
    e = {
        (row.src, row.dst): row.w
        for row in (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(customer, orders.o_custkey == customer.c_custkey)
            .join(supplier, li.l_suppkey == supplier.s_suppkey)
            .filter(F.col("c_nationkey") != F.col("s_nationkey"))
            .groupBy(
                F.col("c_nationkey").alias("src"),
                F.col("s_nationkey").alias("dst"),
            )
            .agg(F.sum(cents).alias("w"))
            .collect()
        )
    }
    n = len(e)
    recip = sum(1 for (s, d) in e if (d, s) in e)
    wmin = sum(min(w, e.get((d, s), 0)) for (s, d), w in e.items())
    wtot = sum(e.values())
    assert r.n_directed_edges == n
    assert r.n_reciprocated == recip
    assert abs(r.edge_reciprocity - recip / n) < 1e-5
    assert abs(r.weighted_reciprocity - wmin / wtot) < 1e-5
    assert 0.0 <= r.weighted_reciprocity <= r.edge_reciprocity + 1e-9 <= 1.0 + 1e-9
