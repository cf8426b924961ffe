"""Time individual queries with the bench's methodology (noop sink,
min-of-N after a warm-up) without the full headline sweep — the
optimization round's inner measurement loop.

Usage:
    python tools/time_queries.py [--sf DIR] [--runs 3] name...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from real_time_big_data_analytics_spark.registry import all_queries
from real_time_big_data_analytics_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("rtba-time-queries")
    queries = all_queries()
    # same warm-up as bench.py: JVM/codegen/streaming machinery once
    warm_sf = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_sf):
        warm_sf = args.sf
    for wq in ("flagship_windowed_analytics", "j1_revenue_by_mktsegment"):
        force(queries[wq].fn(spark, warm_sf))

    out = {}
    for name in args.names:
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.monotonic()
            force(queries[name].fn(spark, args.sf))
            runs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(runs), "runs": runs}
        print(f"{name}: min={min(runs)} runs={runs}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
