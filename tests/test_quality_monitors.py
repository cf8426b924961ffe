"""Production monitoring ops: PSI drift + DQ constraint suite."""

from __future__ import annotations

from real_time_big_data_analytics_spark.operators import relational


def test_psi_identical_halves_is_zero(spark, tmp_path):
    """Identical ref/live distributions must give PSI ~ 0 / stable."""
    import datetime as dt

    rows = []
    for day in (5, 20):  # one ref day, one live day — same values
        for i in range(200):
            rows.append(
                (day * 1000 + i, dt.datetime(2024, 1, day, 12, 0, i % 60),
                 i % 37, "view", float(i % 100), "{}")
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = relational.psi_drift_by_type(spark, str(tmp_path)).collect()
    assert out and all(r.verdict == "stable" and abs(r.psi) < 1e-6 for r in out)


def test_psi_detects_planted_shift(spark, tmp_path):
    """Live values shifted to a different bucket range must flag."""
    import datetime as dt

    rows = []
    for i in range(300):
        rows.append((i, dt.datetime(2024, 1, 5, 12, 0, i % 60), i, "view", 7.0, "{}"))
        rows.append((1000 + i, dt.datetime(2024, 1, 25, 12, 0, i % 60), i, "view", 180.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = relational.psi_drift_by_type(spark, str(tmp_path)).collect()
    assert out[0].verdict == "shifted", out


def test_dq_suite_passes_on_harness_and_catches_planted_violations(spark, sf_dir, tmp_path):
    ok = {r.constraint: r for r in relational.dq_constraint_suite(spark, sf_dir).collect()}
    assert len(ok) == 6
    assert all(r.passed for r in ok.values()), ok
    # planted: duplicate id, null value, out-of-range, bad type, bad ts
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "view", 10.0, "{}"),
        (1, dt.datetime(2024, 1, 2), 2, "hack", -5.0, "{}"),
        (2, dt.datetime(1970, 1, 1), 3, "view", None, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    bad = {r.constraint: r for r in relational.dq_constraint_suite(spark, str(tmp_path)).collect()}
    for c in ("event_id_unique", "value_complete", "value_in_range", "type_in_set", "ts_sane"):
        assert not bad[c].passed, c
    assert bad["user_complete"].passed


def test_referential_integrity_clean_star_schema(spark, sf_dir):
    from real_time_big_data_analytics_spark.operators.relational import (
        dq_referential_integrity,
    )

    rows = dq_referential_integrity(spark, sf_dir).collect()
    assert len(rows) == 7
    # the harness star schema is referentially clean; a synthetic
    # orphan would flip ok to False via n_orphan > 0
    for r in rows:
        assert r.n_child > 0
        assert r.n_orphan == 0 and r.ok


def test_referential_integrity_detects_orphans(spark, sf_dir, tmp_path):
    """Plant an orphan: copy the star schema but drop half the nation
    rows — the customer->nation and supplier->nation edges must flag."""
    import shutil

    from pyspark.sql import functions as F

    from real_time_big_data_analytics_spark.operators.relational import (
        dq_referential_integrity,
    )

    broken = tmp_path / "broken"
    broken.mkdir()
    for t in ("region", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        shutil.copy(f"{sf_dir}/{t}.parquet", broken / f"{t}.parquet")
    spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_nationkey") < 13
    ).coalesce(1).write.mode("overwrite").parquet(str(broken / "nation.parquet"))
    flags = {
        r.edge: r for r in dq_referential_integrity(spark, str(broken)).collect()
    }
    assert not flags["customer.c_nationkey->nation"].ok
    assert flags["customer.c_nationkey->nation"].n_orphan > 0
    assert not flags["supplier.s_nationkey->nation"].ok
    assert flags["lineitem.l_orderkey->orders"].ok


def test_table_profile_exact_stats(spark, sf_dir):
    from real_time_big_data_analytics_spark.operators.relational import (
        PROFILE_COLUMNS,
        dq_table_profile,
    )

    rows = dq_table_profile(spark, sf_dir).collect()
    assert {r.column_name for r in rows} == set(PROFILE_COLUMNS)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    for r in rows:
        assert r.n_rows == n
        direct_nulls = orders.filter(orders[r.column_name].isNull()).count()
        direct_ndv = orders.select(r.column_name).distinct().count()
        assert r.n_nulls == direct_nulls, r.column_name
        assert r.n_distinct == direct_ndv, r.column_name
    ndv = {r.column_name: r.n_distinct for r in rows}
    assert ndv["o_orderkey"] == n  # primary key
    assert ndv["o_orderstatus"] <= 5  # low-cardinality enum


def test_snapshot_diff_known_membership(spark, sf_dir):
    from real_time_big_data_analytics_spark.operators.relational import (
        snapshot_diff_stats,
    )

    got = {r.change_kind: r.n_rows for r in snapshot_diff_stats(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = [r.o_orderkey for r in orders.select("o_orderkey").collect()]
    n_del = sum(1 for k in keys if k % 97 == 0)
    n_ins = sum(1 for k in keys if k % 101 == 0)
    n_chg = sum(1 for k in keys if k % 97 != 0 and k % 31 == 0)
    assert got.get("deleted", 0) == n_del
    assert got.get("inserted", 0) == n_ins
    assert got.get("changed", 0) == n_chg
    assert got.get("unchanged", 0) == len(keys) - n_del - n_chg
    assert sum(got.values()) == len(keys) + n_ins


def test_order_reconciliation_totals(spark, sf_dir):
    from real_time_big_data_analytics_spark.operators.relational import (
        dq_order_reconciliation,
    )

    rows = dq_order_reconciliation(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n
    for r in rows:
        assert 0 <= r.n_mismatched <= r.n_orders
        assert r.max_abs_gap >= 0


def test_join_fanout_audit_matches_actual_join(spark, sf_dir):
    from real_time_big_data_analytics_spark.operators.relational import (
        dq_join_fanout_audit,
    )

    row = dq_join_fanout_audit(spark, sf_dir).collect()[0]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    actual = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert row.join_rows == actual
    assert row.max_mult_orders == 1  # o_orderkey is a key
    assert row.max_mult_lineitem >= 1


def test_winsorize_bounds_and_clip_counts(spark, sf_dir):
    from real_time_big_data_analytics_spark.operators.relational import (
        winsorize_values,
    )

    for r in winsorize_values(spark, sf_dir).collect():
        assert r.p01 <= r.p99
        # ~1% clipped per tail, with slack for small groups and ties
        assert r.n_clipped_lo <= 0.02 * r.n + 2
        assert r.n_clipped_hi <= 0.02 * r.n + 2
        # clipping the tails moves the mean toward the center boundedly
        assert abs(r.mean_after - r.mean_before) <= max(
            abs(r.mean_before) * 0.2, 1.0
        )


def test_zorder_layout_prunes_but_keyorder_does_not(spark, sf_dir):
    from real_time_big_data_analytics_spark.operators.relational import (
        Z_FILES,
        zorder_pruning_audit,
    )

    rows = {r.layout: r for r in zorder_pruning_audit(spark, sf_dir).collect()}
    z, k = rows["zorder"], rows["keyorder"]
    assert z.n_files == k.n_files == Z_FILES
    assert z.rows_total == k.rows_total
    assert z.rows_matched == k.rows_matched  # layout never changes answers
    # every matched row lives in a scanned file
    assert z.rows_scanned >= z.rows_matched
    assert k.rows_scanned >= k.rows_matched
    # the point of z-ordering: a 2-D box touches O(perimeter) tiles
    assert z.files_scanned < k.files_scanned
    assert z.rows_scanned * 4 < k.rows_scanned


def test_key_skew_profile_brute_force(spark, sf_dir):
    from collections import Counter

    from real_time_big_data_analytics_spark.operators.relational import (
        key_skew_profile,
    )

    rows = {r.key: r for r in key_skew_profile(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    c = Counter(e.user_id for e in ev)
    got = rows["events.user_id"]
    assert got.n_keys == len(c) and got.n_rows == len(ev)
    assert got.top1_share_ppm == max(c.values()) * 1_000_000 // len(ev)
    top10 = sum(v for v in sorted(c.values(), reverse=True)[:10])
    assert got.top10_share_ppm == top10 * 1_000_000 // len(ev)
    cs = sorted(c.values())
    n, tot = len(cs), sum(cs)
    gini = (2 * sum((i + 1) * v for i, v in enumerate(cs)) - (n + 1) * tot) * 1_000_000 // (n * tot)
    assert got.gini_ppm == gini
    assert 0 <= got.gini_ppm < 1_000_000


def test_ab_power_analysis_formula(spark, sf_dir):
    import math

    from real_time_big_data_analytics_spark.operators.relational import (
        POWER_MDE_PCT,
        POWER_Z_ALPHA,
        POWER_Z_BETA,
        ab_power_analysis,
    )

    rows = {r.mde_pct: r for r in ab_power_analysis(spark, sf_dir).collect()}
    assert set(rows) == set(POWER_MDE_PCT)
    # larger detectable effects need fewer users, ~quadratically
    ns = [rows[p].n_per_arm_needed for p in sorted(POWER_MDE_PCT)]
    assert ns[0] > ns[1] > ns[2] > 0
    for p in POWER_MDE_PCT:
        r = rows[p]
        delta = r.mean_y * p / 100.0
        want = math.ceil(
            2 * (POWER_Z_ALPHA + POWER_Z_BETA) ** 2 * r.sd_y**2 / (delta * delta)
        )
        # sd_y is rounded in the output; allow 1% slack on the replay
        assert abs(r.n_per_arm_needed - want) <= max(1, want * 0.01)
        assert r.feasible_now == (r.n_per_arm_needed * 2 <= r.n_users_observed)


def test_hbos_outliers_matches_numpy_replay(spark, sf_dir):
    """Top-k HBOS rows must equal a numpy replay (same binning, same
    ln-count scoring, same total order), and scores must be
    non-negative with the max score first."""
    import math

    import numpy as np

    from real_time_big_data_analytics_spark.operators import relational
    from real_time_big_data_analytics_spark.sources.tables import load_table

    rows = relational.hbos_outliers(spark, sf_dir).collect()

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).toPandas()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .count()
        .toPandas()
    )
    f = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    B = relational.HBOS_BINS

    def bins(x):
        x = x.astype(float).to_numpy()
        lo, hi = x.min(), x.max()
        return np.minimum(((x - lo) / (hi - lo) * B).astype(int), B - 1)

    bp, bi = bins(f.o_totalprice), bins(f["count"])
    cp = np.bincount(bp, minlength=B)
    ci = np.bincount(bi, minlength=B)
    score = (np.log(cp.max()) - np.log(cp[bp])) + (
        np.log(ci.max()) - np.log(ci[bi])
    )
    order = sorted(
        zip(f.o_orderkey, bp, bi, score), key=lambda t: (-t[3], t[0])
    )[: relational.HBOS_TOPK]
    assert len(rows) == len(order)
    for r, (k, p, i, s) in zip(rows, order):
        assert r.o_orderkey == k
        assert (r.bin_price, r.bin_items) == (p, i)
        assert abs(r.hbos_score - s) < 1e-5
        assert r.hbos_score >= -1e-9
    assert rows[0].hbos_score == max(r.hbos_score for r in rows)


def test_delta_attribution_decomposition_is_exact(spark, sf_dir):
    """volume_effect + rate_effect must reconstruct each segment's
    delta (the decomposition identity), shares must sum to 1, and the
    numbers must match a pandas replay."""
    import pandas as pd

    from real_time_big_data_analytics_spark.operators import relational
    from real_time_big_data_analytics_spark.sources.tables import load_table

    rows = relational.delta_attribution(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).toPandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["p2"] = j.o_orderdate >= pd.Timestamp(relational.ATTR_CUT)
    total_delta = 0.0
    expect = {}
    for seg, grp in j.groupby("c_mktsegment"):
        a, b = grp[~grp.p2], grp[grp.p2]
        n1, n2 = len(a), len(b)
        r1 = round(a.o_totalprice.sum(), 2)
        r2 = round(b.o_totalprice.sum(), 2)
        expect[seg] = (n1, n2, r1, r2)
        total_delta += r2 - r1
    for r in rows:
        n1, n2, r1, r2 = expect[r.segment]
        assert (r.n1, r.n2) == (n1, n2)
        assert abs(r.rev1 - r1) < 0.02 and abs(r.rev2 - r2) < 0.02
        assert abs(r.delta - (r2 - r1)) < 0.03
        # decomposition identity (on the unrounded identity, 1-cent slack)
        assert abs((r.volume_effect + r.rate_effect) - r.delta) < 0.03
        assert abs(r.share_of_total_delta - (r2 - r1) / total_delta) < 1e-4
    assert abs(sum(r.share_of_total_delta for r in rows) - 1.0) < 1e-4


def test_column_entropy_profile_matches_python_replay(spark, sf_dir):
    """Entropy values must equal a python replay; normalized entropy
    must sit in [0, 1] with the uniformity ordering sensible."""
    import math
    from collections import Counter

    from real_time_big_data_analytics_spark.operators import relational
    from real_time_big_data_analytics_spark.sources.tables import load_table

    rows = {
        r.column_name: r
        for r in relational.column_entropy_profile(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders").toPandas()
    cust = load_table(spark, sf_dir, "customer").toPandas()
    series = {
        "o_orderstatus": orders.o_orderstatus,
        "o_orderpriority": orders.o_orderpriority,
        "c_mktsegment": cust.c_mktsegment,
        "c_nationkey": cust.c_nationkey.astype(str),
    }
    assert set(rows) == set(series)
    for name, s in series.items():
        counts = Counter(s)
        n = sum(counts.values())
        h = -sum((c / n) * math.log(c / n) for c in counts.values())
        r = rows[name]
        assert r.n_distinct == len(counts)
        assert abs(r.entropy_nats - h) < 1e-5
        assert abs(r.entropy_normalized - h / math.log(len(counts))) < 1e-5
        assert 0.0 <= r.entropy_normalized <= 1.0 + 1e-9


def test_event_order_audit_matches_pandas_replay(spark, sf_dir):
    """Violation counts must equal a pandas replay of the same
    first-event comparisons."""
    from real_time_big_data_analytics_spark.operators import relational
    from real_time_big_data_analytics_spark.sources.tables import load_table

    rows = {r.check: r for r in relational.event_order_audit(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).toPandas()
    firsts = ev.pivot_table(
        index="user_id", columns="event_type", values="ts", aggfunc="min"
    )
    fp = firsts.get("purchase")
    fs = firsts.get("signup")
    fv = firsts.get("view")
    fc = firsts.get("click")
    both_ps = fp.notna() & fs.notna()
    both_cv = fc.notna() & fv.notna()
    expect = {
        "purchase_before_signup": (
            int(both_ps.sum()),
            int((both_ps & (fp < fs)).sum()),
        ),
        "click_before_view": (
            int(both_cv.sum()),
            int((both_cv & (fc < fv)).sum()),
        ),
        "purchase_without_any_signup": (
            int(fp.notna().sum()),
            int((fp.notna() & fs.isna()).sum()),
        ),
    }
    assert set(rows) == set(expect)
    for k, (na, nv) in expect.items():
        r = rows[k]
        assert (r.n_applicable, r.n_violations) == (na, nv)
        assert abs(r.violation_rate - nv / max(na, 1)) < 1e-5
