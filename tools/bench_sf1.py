"""BENCH_SF1 (VERDICT r7 ask #4): the headline suite's top-10
wall-clock queries re-measured at an sf1-EQUIVALENT dataset (~6 M
lineitem rows) built by tools/scale_smoke's join-preserving 10x
replication of sf0.1, with the same ambient capture bench.py records.

Selection: the ten most expensive FACT-SCALING queries from the latest
BENCH_SUMMARY (l3_mmr_diversified_topk is excluded and documented —
its input, embeddings, is a dimension table in this harness, so a 10x
fact replication measures nothing about it). Document-PAIR queries run
on the mostly-unique tagged corpus (scale_smoke.UNIQUE_QUERIES): a
verbatim 10x replication makes every doc a 10-way duplicate clique, a
property of the synthetic workload rather than the plan.

Timing: min-of-3 per query per scale after a shared warm-up, noop-sink
forced (full computation, no driver collect). Output: one JSON line +
BENCH_SF1.json with per-query base/sf1 seconds and the ratio; the
SCALE.md table is derived from this file. Linear-with-logs is the bar:
ratio ~<= k plus modest log terms; anything >> k is a scale bug.

Usage: python tools/bench_sf1.py [--k 10] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (ambient capture + force, shared with the driver bench)
from tools import scale_smoke  # noqa: E402

# Top-10 by BENCH_SUMMARY_r07 wall clock, fact-scaling only (see
# module docstring for the one exclusion).
TOP10 = (
    "l6_training_mix_v2",
    "s_kafka_wire_roundtrip",
    "l6_training_pipeline",
    "rec_copurchase_topk",
    "l4_rrf_hybrid_search",
    "graph_trade_communities",
    "l2_ppjoin_jaccard_pairs",
    "dq_zorder_pruning_audit",
    "l2_ngram_jaccard_pairs",
    "graph_trade_pagerank",
)
EXCLUDED = {
    "l3_mmr_diversified_topk": "input (embeddings) is a dimension table "
    "in this harness; fact replication measures nothing about it",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from real_time_big_data_analytics_spark.registry import all_queries
    from real_time_big_data_analytics_spark.session import get_spark

    spark = get_spark("rtba-bench-sf1")
    queries = all_queries()
    names = tuple(args.names) or TOP10

    amb_pre = bench._ambient()
    big = scale_smoke.build(spark, args.sf, args.k)
    big_uniq = (
        scale_smoke.build_unique(spark, args.sf, args.k)
        if any(n in scale_smoke.UNIQUE_QUERIES for n in names)
        else None
    )
    bench.force(queries["q1_pricing_summary"].fn(spark, args.sf))  # warm-up

    report = {}
    for name in names:
        big_dir = (
            big_uniq if name in scale_smoke.UNIQUE_QUERIES else big
        )
        times = {}
        for label, sf_dir in (("base", args.sf), ("sf1", big_dir)):
            runs = []
            for _ in range(3):
                t0 = time.monotonic()
                bench.force(queries[name].fn(spark, sf_dir))
                runs.append(time.monotonic() - t0)
            times[label] = round(min(runs), 3)
        ratio = round(times["sf1"] / max(times["base"], 1e-9), 2)
        corpus = "unique" if name in scale_smoke.UNIQUE_QUERIES else "verbatim"
        report[name] = {**times, "ratio": ratio, "corpus": corpus}
        print(
            f"{name:32s} base={times['base']:7.3f}s "
            f"sf1={times['sf1']:8.3f}s ratio={ratio:6.2f} ({corpus})",
            flush=True,
        )

    out = {
        "k": args.k,
        "base_sf": args.sf,
        "queries": report,
        "excluded": EXCLUDED,
        "ambient_pre": amb_pre,
        "ambient_post": bench._ambient(),
    }
    path = os.path.join(REPO, "BENCH_SF1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": path, "k": args.k,
                      "ratios": {n: r["ratio"] for n, r in report.items()}}))


if __name__ == "__main__":
    main()
