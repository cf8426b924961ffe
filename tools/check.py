"""Local replica of the driver's correctness gate.

Runs every registered query on Spark at a given sf_dir AND its DuckDB
oracle twin, then compares row-count + schema + order-insensitive
values. Exact comparison with a float-diff report so we learn whether
our rounding strategy achieves engine-exact equality (the driver
hashes values, so "close" is not good enough).

Usage:
    python tools/check.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# BEFORE any SparkSession/registry load: lets the conditionally-
# registered transformWithState query (t21) into this gate sweep —
# the shim lands on PYTHONPATH pre-JVM, so state-server workers see it
from real_time_big_data_analytics_spark.compat import enable_protobuf_shim

enable_protobuf_shim()

from real_time_big_data_analytics_spark.registry import all_queries
from real_time_big_data_analytics_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Oracle connection with a hard memory ceiling. The naive-twin
    oracles are brute-force references sized for the driver's sf0.01
    gate; at sf0.1 a quadratic all-pairs twin can otherwise grow until
    the kernel OOM-kills the whole process (observed: 128 GB anon RSS
    during a whole-surface sf0.1 attempt). With the limit + a spill
    directory, DuckDB spills what it can and raises OutOfMemoryError
    for what it can't — the sweep records a clean per-query failure
    instead of taking the host down.

    The spill directory is removed at interpreter exit (ADVICE r5:
    a fresh mkdtemp per connection leaked dirs across repeated sweeps,
    potentially holding large spill files after an abnormal exit)."""
    import atexit
    import shutil
    import tempfile

    con = duckdb.connect()
    con.execute("SET memory_limit='48GB'")
    spill = tempfile.mkdtemp(prefix="rtba_duck_spill_")
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for order-insensitive compare: sort cols by name,
    stringify cells deterministically, sort rows.

    Floats stringify via ``repr`` with NO integral folding: the driver
    hashes dtype-faithful values, so ``2`` (int64) vs ``2.0`` (float64)
    must mismatch here exactly as it does there (CORRECTNESS_r04 q12).
    """
    df = df[sorted(df.columns)].copy()

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(float(v))
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        import numpy as _np

        if isinstance(v, _np.ndarray):
            return "[" + ",".join(cell(x) for x in v.tolist()) + "]"
        if isinstance(v, _np.floating):
            return repr(float(v))
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def _dtype_kind(dtype) -> str:
    """Bucket a pandas dtype into the classes the driver's value hash
    distinguishes: int-like, float, bool, datetime, other(object)."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in ("M", "m"):
        return "datetime"
    return "object"


def dtype_parity(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Spark-vs-oracle column dtype-kind parity. DuckDB types integer
    ``sum()`` as HUGEINT which pandas converts to float64 while Spark
    returns int64; the driver's hash sees 2.0 vs 2 and fails even when
    values are numerically identical. Catch that locally. ``object``
    columns (strings, dates, lists, decimals) are left to the value
    compare — pandas conversion is too lossy to type-check them."""
    problems = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        ks, ko = _dtype_kind(sdf[c].dtype), _dtype_kind(odf[c].dtype)
        if ks == ko or "object" in (ks, ko):
            continue
        problems.append(
            f"dtype kind differs on '{c}': spark={sdf[c].dtype}({ks}) "
            f"oracle={odf[c].dtype}({ko}) — driver hash will mismatch; "
            f"CAST the oracle (or Spark) side to align"
        )
    return problems


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    problems.extend(dtype_parity(sdf, odf))
    cs, co = canon(sdf), canon(odf)
    if len(cs) == len(co) and not cs.equals(co):
        neq = (cs != co).any(axis=1)
        bad = cs[neq]
        problems.append(f"{int(neq.sum())} mismatched rows; first few:")
        for i in bad.index[:3]:
            problems.append(f"  spark : {cs.loc[i].to_dict()}")
            problems.append(f"  oracle: {co.loc[i].to_dict()}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--json",
        metavar="OUT",
        help="also write a per-query result map in the driver's "
        "CORRECTNESS_r{N}.json shape (the committed full-surface receipt)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    qs = all_queries()
    names = args.names or list(qs)
    spark = get_spark("check")
    con = duck_connection(args.sf)

    failures = 0
    results: dict[str, dict] = {}
    for name in names:
        q = qs[name]
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        results[name] = rec
        t0 = time.monotonic()
        try:
            sdf = q.fn(spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            rec["err"] = f"spark:{type(e).__name__}"
            failures += 1
            continue
        dt = time.monotonic() - t0
        rec["spark_rows"] = len(sdf)
        if q.sql is None:
            status = "rows-only"
            ok = len(sdf) >= 0
            rec["err"] = "no_oracle"
            print(f"{'ok  ' if ok else 'FAIL'} {name} [{status}] rows={len(sdf)} ({dt:.1f}s)")
            continue
        try:
            odf = con.execute(q.sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            rec["err"] = f"oracle:{type(e).__name__}"
            failures += 1
            continue
        rec["oracle_rows"] = len(odf)
        problems = compare(name, sdf, odf)
        rec["rows_match"] = len(sdf) == len(odf)
        rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        rec["hash_match"] = not problems
        if problems:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s)")
            for p in problems:
                print("   ", p)
        else:
            print(f"ok   {name} rows={len(sdf)} ({dt:.1f}s)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
