"""Generate PLANS.md: one row of physical-plan properties per batch
query — the scale-design evidence, regenerated from the real plans.

Usage: python tools/plan_report.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JOIN_NODES = [
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
]
PY_NODES = [
    "ArrowEvalPythonUDTF",
    "ArrowAggregatePython",
    "MapInPandas",
    "BatchEvalPython",
    "FlatMapGroupsInPandas",
]


def describe(plan: str) -> dict[str, str]:
    joins = []
    for node in JOIN_NODES:
        n = plan.count(node)
        if n:
            joins.append(f"{n}×{node.replace('Join', '')}")
    py = [n for n in PY_NODES if n in plan]
    return {
        # \bExchange won't match ReusedExchange (no word boundary mid-token)
        "exchanges": str(len(re.findall(r"\bExchange ", plan))),
        "joins": " ".join(joins) or "—",
        "pushed": "yes" if re.search(r"PushedFilters: \[(?!\])", plan) else "—",
        "python": " ".join(py) or "—",
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from real_time_big_data_analytics_spark.registry import all_queries
    from real_time_big_data_analytics_spark.session import get_spark

    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")

    n_queries = 0
    lines = [
        "# PLANS — physical-plan audit (auto-generated)",
        "",
        f"`python tools/plan_report.py --sf {args.sf}` regenerates this",
        "from the executed plans: shuffle count, join strategies, whether",
        "any filter reached the parquet scan, and which (if any) sanctioned",
        "Arrow-vectorized Python nodes appear. Streaming queries are",
        "excluded (replay runners, not lazy plans). Plans are captured",
        "pre-execution: AQE may further demote a listed SortMergeJoin to a",
        "broadcast at runtime when the build side turns out small. Exchange",
        "counts include the round-robin spread() guards that fire only for",
        "single-row-group harness files (sources/tables.py) — at production",
        "scale those exchanges do not exist.",
        "",
        "| query | exchanges | join strategies | pushdown | python |",
        "|---|---|---|---|---|",
    ]
    for name, q in sorted(all_queries().items()):
        if "streaming" in q.tags:
            continue
        n_queries += 1
        try:
            plan = q.fn(spark, args.sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # pragma: no cover - report, don't die
            lines.append(f"| `{name}` | ERROR | {type(ex).__name__} | | |")
            continue
        d = describe(plan)
        lines.append(
            f"| `{name}` | {d['exchanges']} | {d['joins']} | {d['pushed']} | {d['python']} |"
        )
    out = os.path.join(REPO, "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({n_queries} queries)")


if __name__ == "__main__":
    main()
