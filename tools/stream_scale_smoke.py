"""Streaming scale smoke (VERDICT r5 ask #5): replay ``events`` ×K
through the stateful streaming family — t4 (windowed agg), t13
(watermark-bounded dedup), t17 (applyInPandasWithState EWMA) — with
the RocksDB state-store provider, and record events/s AND state-store
size at both scales.

The claim under test is §2.8's one remaining documentation-only scale
claim: streaming state is bounded by KEY CARDINALITY or the WATERMARK
HORIZON, not by input volume. The ×K corpus keeps the time span, user
range, and event-type set fixed while multiplying rows, so:

- t4 (complete-mode windowed agg): state rows = windows × types —
  must be EQUAL at both scales;
- t17 (per-user custom state): state rows = distinct users — EQUAL;
- t13 (dropDuplicatesWithinWatermark on unique event_ids — the
  adversarial case, every key distinct): max in-flight state must
  track the watermark horizon (~one micro-batch's key count), far
  below the stream's total key count. The replay is chunked into
  time-ordered files with maxFilesPerTrigger=1 so the watermark
  advances between micro-batches and eviction is observable in
  recentProgress (a single-batch replay would hold everything, and
  a real deployment is never a single batch).

The ×K builder sorts replicated events by ts and writes N time-range
chunks as individually-mtime-staggered parquet files under
``events.parquet/`` (a directory — events_stream symlinks each file;
FileStreamSource discovers in mtime order).

Usage: python tools/stream_scale_smoke.py [--k 100] [--chunks 16]
       [--sf /root/testdata/sf0.1] [names...]
Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STREAM_QUERIES = (
    "t4_stream_windowed_analytics",
    "t13_stream_dedup_within_watermark",
    "t17_stream_stateful_ewma",
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def build_chunked(
    spark, src: str, k: int, n_chunks: int, *, time_shift: bool = False
) -> str:
    """events ×K, written as n_chunks time-range files with increasing
    mtimes; other tables symlinked.

    Default mode multiplies RATE: copies shift event_id only, so the
    time span stays fixed and each micro-batch carries K× the events.
    ``time_shift`` multiplies DURATION instead: copy i also shifts ts
    by i×(span+1s), giving a K×-longer stream at the ORIGINAL rate —
    the control that separates 'state grows with rate×horizon'
    (physics) from 'state grows with stream length' (a leak)."""
    from pyspark.sql import functions as F

    st = os.stat(os.path.join(src, "events.parquet"))
    mode = "shift" if time_shift else "rate"
    tag = hashlib.md5(
        f"{src}|stream|{mode}|{k}|{n_chunks}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"rtba_stream_scale_{tag}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    os.makedirs(out, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        srcp = os.path.join(src, f"{name}.parquet")
        dstp = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dstp):
            os.symlink(srcp, dstp)

    from real_time_big_data_analytics_spark.sources.tables import (
        normalize_timestamps,
    )

    # normalize ts up front (the driver testdata varies encodings:
    # nanos-long / NTZ / LTZ) — the replicated corpus is written with
    # plain TIMESTAMP, which every consumer handles
    ev = normalize_timestamps(spark.read.parquet(os.path.join(src, "events.parquet")))
    span = ev.agg(F.max("event_id")).first()[0] + 1
    lo, hi = ev.agg(
        F.min(F.col("ts").cast("double")), F.max(F.col("ts").cast("double"))
    ).first()
    dur = hi - lo + 1.0
    copies = []
    for i in range(k):
        c = ev.withColumn("event_id", F.col("event_id") + F.lit(int(i * span)))
        if time_shift and i:
            c = c.withColumn(
                "ts",
                F.timestamp_seconds(F.col("ts").cast("double") + F.lit(i * dur)),
            )
        copies.append(c)
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    total_dur = dur * k if time_shift else dur
    bucket = F.least(
        F.lit(n_chunks - 1),
        ((F.col("ts").cast("double") - F.lit(lo)) / F.lit(total_dur / n_chunks))
        .cast("int"),
    )
    # one shuffle writes every chunk: repartition by bucket, then
    # partitionBy gives one file per bucket directory
    tmp = os.path.join(out, "_chunks_tmp")
    (
        big.withColumn("_bucket", bucket)
        .repartition(n_chunks, "_bucket")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(tmp)
    )
    evdir = os.path.join(out, "events.parquet")
    os.makedirs(evdir, exist_ok=True)
    now = time.time()
    for b in range(n_chunks):
        bdir = os.path.join(tmp, f"_bucket={b}")
        if not os.path.isdir(bdir):  # empty time range
            continue
        parts = sorted(f for f in os.listdir(bdir) if f.endswith(".parquet"))
        for j, part in enumerate(parts):
            dst = os.path.join(evdir, f"chunk_{b:05d}_{j}.parquet")
            shutil.move(os.path.join(bdir, part), dst)
            os.utime(dst, (now + b, now + b))  # discovery follows time order
    shutil.rmtree(tmp, ignore_errors=True)
    open(os.path.join(out, "_SUCCESS"), "w").close()
    return out


def state_metrics(progress: list[dict]) -> dict:
    """Max state rows / bytes across the replay's micro-batches, plus
    total input rows (the state-bounded-ness receipt)."""
    max_rows = max_bytes = inputs = 0
    for p in progress:
        inputs += int(p.get("numInputRows", 0))
        rows = sum(int(op.get("numRowsTotal", 0)) for op in p.get("stateOperators", []))
        byts = sum(
            int(op.get("stateMemory", op.get("memoryUsedBytes", 0)) or 0)
            for op in p.get("stateOperators", [])
        )
        max_rows = max(max_rows, rows)
        max_bytes = max(max_bytes, byts)
    return {
        "batches": len(progress),
        "input_rows": inputs,
        "max_state_rows": max_rows,
        "max_state_bytes": max_bytes,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--time-shift",
        action="store_true",
        help="grow stream DURATION (k x longer at original rate) instead "
        "of rate — the state-vs-length control; pair with chunks scaled "
        "by k so per-batch volume stays fixed",
    )
    ap.add_argument(
        "--providers",
        default="rocksdb",
        help="comma list of state-store providers to run: rocksdb, "
        "default (HDFS-backed) — 'rocksdb,default' produces the "
        "side-by-side table SCALE.md §r11 records",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_STREAM_MAX_FILES"] = "1"

    from real_time_big_data_analytics_spark.registry import all_queries
    from real_time_big_data_analytics_spark.session import get_spark
    from real_time_big_data_analytics_spark.streaming import runner

    spark = get_spark("rtba-stream-scale")
    # recentProgress keeps only the last N batch reports (default 100);
    # the time-shift control replays 500+ micro-batches and the state
    # receipt must cover ALL of them
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "4096")

    big = build_chunked(
        spark, args.sf, args.k, args.chunks, time_shift=args.time_shift
    )
    # base corpus in the same chunked shape — and for the time-shift
    # control, the same PER-BATCH event volume — so the comparison
    # isolates data volume (not replay cadence)
    base_chunks = max(1, args.chunks // args.k) if args.time_shift else args.chunks
    base = build_chunked(spark, args.sf, 1, base_chunks)
    queries = all_queries()

    providers = {
        "rocksdb": ROCKSDB,
        "default": (
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider"
        ),
    }
    chosen = [p.strip() for p in args.providers.split(",") if p.strip()]
    report: dict[str, dict] = {}
    for name in args.names or STREAM_QUERIES:
        report[name] = {}
        for prov in chosen:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                providers[prov],
            )
            rep = report[name] if len(chosen) == 1 else report[name].setdefault(prov, {})
            for label, sf_dir in (("base", base), (f"x{args.k}", big)):
                t0 = time.monotonic()
                n_out = queries[name].fn(spark, sf_dir).count()
                wall = time.monotonic() - t0
                m = state_metrics(runner.LAST_RECENT_PROGRESS)
                m["wall_sec"] = round(wall, 2)
                m["events_per_sec"] = round(m["input_rows"] / wall, 1)
                m["out_rows"] = n_out
                rep[label] = m
                print(
                    f"{name:36s} {prov:8s} {label:6s} wall={wall:7.2f}s "
                    f"in={m['input_rows']:>9d} eps={m['events_per_sec']:>10.1f} "
                    f"batches={m['batches']:>3d} max_state_rows={m['max_state_rows']:>9d} "
                    f"max_state_bytes={m['max_state_bytes']:>11d}"
                )
            b, x = rep["base"], rep[f"x{args.k}"]
            rep["state_rows_ratio"] = round(
                x["max_state_rows"] / max(b["max_state_rows"], 1), 2
            )
            rep["wall_ratio"] = round(
                x["wall_sec"] / max(b["wall_sec"], 1e-9), 2
            )
    print(json.dumps({"k": args.k, "chunks": args.chunks,
                      "providers": chosen,
                      "mode": "time_shift" if args.time_shift else "rate",
                      "queries": report}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
