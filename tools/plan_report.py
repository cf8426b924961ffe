"""Generate PLANS.md: one row of physical-plan properties per batch
query — the scale-design evidence, regenerated from the real plans,
both pre-AQE (static planning) and post-AQE (the final adaptive plan
after execution, where runtime stats may demote/promote join
strategies and coalesce partitions).

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


def _joins(plan: str) -> str:
    out = []
    for node in JOIN_NODES:
        n = plan.count(node)
        if n:
            out.append(f"{n}×{node.replace('Join', '')}")
    return " ".join(out) or "—"


def _exchanges(plan: str) -> int:
    # \bExchange won't match ReusedExchange (no word boundary mid-token)
    return len(re.findall(r"\bExchange ", plan))


def describe(pre: str, post: str | None, pre_fmt: str = "") -> dict[str, str]:
    py = [n for n in PY_NODES if n in pre]
    # DSv2 scans (Python data sources, ORC/parquet v2) print their
    # PushedFilters only in FORMATTED explain — the tree string shows
    # a bare `BatchScan`; check both representations.
    pushed = re.search(r"PushedFilters: \[(?!\])", pre) or re.search(
        r"PushedFilters: \[(?!\])", pre_fmt
    )
    d = {
        "exchanges": str(_exchanges(pre)),
        "joins": _joins(pre),
        "pushed": "yes" if pushed else "—",
        "python": " ".join(py) or "—",
    }
    if post is None:
        d["final"] = "(not executed)"
    else:
        fin_joins, fin_ex = _joins(post), _exchanges(post)
        if fin_joins == d["joins"] and str(fin_ex) == d["exchanges"]:
            d["final"] = "same"
        else:
            d["final"] = f"{fin_ex} ex; {fin_joins}"
    return d


def final_plan(df) -> str | None:
    """Execute the frame and return the final adaptive plan section
    (AdaptiveSparkPlan prints final + initial once isFinalPlan=true).

    Must be ``collect()``, not ``count()``: count() builds and runs a
    DIFFERENT Dataset, leaving this frame's own QueryExecution
    unexecuted (isFinalPlan=false → the 'final' plan would just echo
    the static one). Result sizes are bounded at the audit SF."""
    try:
        df.collect()  # triggers execution of THIS QueryExecution
        full = df._jdf.queryExecution().executedPlan().toString()
        return full.split("Initial Plan")[0]
    except Exception:  # pragma: no cover - report, don't die
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from real_time_big_data_analytics_spark.compat import enable_protobuf_shim

    enable_protobuf_shim()  # pre-JVM: the conditional t21 registers

    from real_time_big_data_analytics_spark.registry import all_queries
    from real_time_big_data_analytics_spark.session import get_spark

    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")

    n_queries = 0
    lines = [
        "# PLANS — physical-plan audit (auto-generated)",
        "",
        f"`python tools/plan_report.py --sf {args.sf}` regenerates this",
        "from the real plans. Static columns (exchanges / join",
        "strategies / pushdown / python) come from the pre-execution",
        "plan; `post-AQE` re-reads the plan AFTER executing the query, so",
        "runtime join demotions/promotions and partition coalescing are",
        "visible — `same` means AQE kept the static strategy. Streaming",
        "queries are excluded (replay runners, not lazy plans). Exchange",
        "counts include the round-robin spread() guards that fire only for",
        "single-row-group harness files (sources/tables.py) — at production",
        "scale those exchanges do not exist.",
        "",
        "| query | exchanges | join strategies | pushdown | python | post-AQE |",
        "|---|---|---|---|---|---|",
    ]
    for name, q in sorted(all_queries().items()):
        if "streaming" in q.tags:
            continue
        n_queries += 1
        try:
            df = q.fn(spark, args.sf)
            qe = df._jdf.queryExecution()
            pre = qe.executedPlan().toString()
            pre_fmt = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        except Exception as ex:  # pragma: no cover - report, don't die
            lines.append(f"| `{name}` | ERROR | {type(ex).__name__} | | | |")
            continue
        d = describe(pre, final_plan(df), pre_fmt)
        lines.append(
            f"| `{name}` | {d['exchanges']} | {d['joins']} | {d['pushed']} "
            f"| {d['python']} | {d['final']} |"
        )
    out = os.path.join(REPO, "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({n_queries} queries)")


if __name__ == "__main__":
    main()
