"""Dump ``explain("formatted")`` for named queries into plans/r<N>/.

The optimization-round evidence trail: for every query touched in an
optimization round, the judge checks the committed before/after plans
against the code. Usage:

    python tools/plan_dump.py --round 11 --suffix before [--sf DIR] name...

Plans are captured pre-execution (AdaptiveSparkPlan isFinalPlan=false)
— the static shape (Exchange count, join strategy, PushedFilters,
ReadSchema, Python eval nodes) is what the round's claims cite.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from real_time_big_data_analytics_spark.registry import all_queries
from real_time_big_data_analytics_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--suffix", required=True, help="before|after")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    out_dir = os.path.join(REPO, "plans", f"r{args.round}")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("rtba-plan-dump")
    queries = all_queries()
    for name in args.names:
        try:
            df = queries[name].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan if plan.endswith("\n") else plan + "\n")
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
