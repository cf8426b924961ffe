"""Round-over-round bench regression table.

Usage:
    python tools/bench_diff.py                 # newest two BENCH_r*.json
    python tools/bench_diff.py OLD.json NEW.json

Reads the driver-recorded bench JSONs (either the raw driver wrapper
with a "parsed" field or bench.py's bare JSON line) and prints one row
per query: old, new, delta, and delta% — sorted worst-regression
first — plus totals and queries added/removed between rounds. Exit
code 1 if any query regressed by more than REG_THRESHOLD (so CI-style
wrappers can gate on it).

Ambient normalization (VERDICT r6 ask #4): when BOTH rounds' sibling
``BENCH_SUMMARY_r{N}.json`` files carry the ``ambient`` block bench.py
records since r7 (loadavg, memory, and a fixed single-thread
calibration loop ``calib_sec``), the table gains a ``norm%`` column —
the delta%% after dividing the new time by the rounds' calibration
ratio — so a host running uniformly 20% slower reads as ~0% normalized
drift instead of 52 spurious "regressions". The regression gate uses
the normalized delta when available. When a summary also carries the
per-query raw ``samples`` (three runs behind each min), the row is
annotated when old/new sample ranges overlap — a regression whose
ranges overlap is indistinguishable from ambient noise.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG_THRESHOLD = 0.5  # seconds of per-query slowdown that counts as a regression


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if data.get("parsed") is not None:
        return data["parsed"]
    if "queries" in data:
        return data
    # driver wrapper with parsed=null: the bench JSON line is the last
    # parseable line of the recorded stdout tail
    for line in reversed(data.get("tail", "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    # tail head-truncated (the r3 buffer failure mode): the builder's
    # sibling BENCH_SUMMARY_r{N}.json carries the same queries dict
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    if m:
        cand = os.path.join(
            os.path.dirname(path) or ".", f"BENCH_SUMMARY_r{m.group(1)}.json"
        )
        if os.path.exists(cand):
            return load(cand)
    sys.exit(f"{path}: no bench JSON found (parsed=null, no JSON line in tail)")


def sibling_summary(path: str) -> dict:
    """The BENCH_SUMMARY_r{N}.json next to a BENCH_r{N}.json (or the
    file itself if it already carries ambient/samples) — {} if none."""
    data = load(path)
    if "ambient" in data or "samples" in data:
        return data
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    if m:
        cand = os.path.join(
            os.path.dirname(path) or ".", f"BENCH_SUMMARY_r{m.group(1)}.json"
        )
        if os.path.exists(cand):
            return load(cand)
    return {}


def calib_sec(summary: dict) -> float | None:
    """Mean of the pre/post single-thread calibration loop times —
    None when the round predates ambient capture."""
    amb = summary.get("ambient") or {}
    vals = [
        amb.get(k, {}).get("calib_sec")
        for k in ("pre", "post")
        if isinstance(amb.get(k), dict)
    ]
    vals = [v for v in vals if isinstance(v, (int, float)) and v > 0]
    return sum(vals) / len(vals) if vals else None


def _main() -> None:
    if len(sys.argv) == 3:
        old_path, new_path = sys.argv[1], sys.argv[2]
    else:
        old_path, new_path = newest_two()
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    osum, nsum = sibling_summary(old_path), sibling_summary(new_path)
    ocal, ncal = calib_sec(osum), calib_sec(nsum)
    # >1 means the new round's host ran the fixed loop slower
    calib_ratio = (ncal / ocal) if (ocal and ncal) else None
    osamp, nsamp = osum.get("samples", {}), nsum.get("samples", {})

    rows = []
    for name in sorted(set(oq) & set(nq)):
        d = nq[name] - oq[name]
        pct = 100.0 * d / oq[name] if oq[name] else 0.0
        nd = (nq[name] / calib_ratio - oq[name]) if calib_ratio else None
        npct = 100.0 * nd / oq[name] if (nd is not None and oq[name]) else None
        overlap = ""
        if name in osamp and name in nsamp and osamp[name] and nsamp[name]:
            if min(nsamp[name]) <= max(osamp[name]) and min(osamp[name]) <= max(
                nsamp[name]
            ):
                overlap = " (samples overlap)"
        rows.append((nd if nd is not None else d, pct, npct, name, d, overlap))
    # key on the numeric pair only: r[2] (npct) is None for zero-old
    # rows and a float elsewhere — letting it join the comparison
    # raises TypeError on (eff_d, pct) ties with mixed npct types
    rows.sort(key=lambda r: (r[0], r[1]), reverse=True)

    w = max((len(r[3]) for r in rows), default=10)
    print(f"{os.path.basename(old_path)} -> {os.path.basename(new_path)}")
    if calib_ratio:
        print(
            f"ambient calib: {ocal:.4f}s -> {ncal:.4f}s "
            f"(new host x{calib_ratio:.3f} the old's single-thread time; "
            "norm% divides new times by this)"
        )
    hdr = f"{'query':<{w}}  {'old':>7}  {'new':>7}  {'delta':>7}  {'pct':>7}"
    if calib_ratio:
        hdr += f"  {'norm%':>7}"
    print(hdr)
    regressed = []
    for eff_d, pct, npct, name, d, overlap in rows:
        flag = " <-- regressed" if eff_d > REG_THRESHOLD else ""
        line = (
            f"{name:<{w}}  {oq[name]:>7.3f}  {nq[name]:>7.3f}"
            f"  {d:>+7.3f}  {pct:>+6.1f}%"
        )
        if npct is not None:
            line += f"  {npct:>+6.1f}%"
        print(line + flag + (overlap if eff_d > REG_THRESHOLD else ""))
        if eff_d > REG_THRESHOLD:
            regressed.append(name)

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("added:  ", ", ".join(f"{n} ({nq[n]:.3f}s)" for n in added))
    if removed:
        print("removed:", ", ".join(removed))
    t_old = sum(oq[n] for n in set(oq) & set(nq))
    t_new = sum(nq[n] for n in set(oq) & set(nq))
    line = f"shared-query total: {t_old:.3f}s -> {t_new:.3f}s ({t_new - t_old:+.3f}s)"
    if calib_ratio:
        line += f"; normalized: {t_new / calib_ratio:.3f}s"
    print(line)
    if "stream_events_per_sec" in old and "stream_events_per_sec" in new:
        print(
            f"stream events/s: {old['stream_events_per_sec']:,.0f} -> "
            f"{new['stream_events_per_sec']:,.0f}"
        )
    sys.exit(1 if regressed else 0)


def newest_two() -> tuple[str, str]:
    rounds = []
    for fn in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if m:
            rounds.append((int(m.group(1)), os.path.join(REPO, fn)))
    rounds.sort()
    if len(rounds) < 2:
        sys.exit("need two BENCH_r*.json rounds (or pass two paths)")
    return rounds[-2][1], rounds[-1][1]


def main() -> None:
    try:
        _main()
    except BrokenPipeError:  # e.g. piped into head
        import os
        import sys

        # suppress the interpreter's implicit flush-on-exit complaint
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())


if __name__ == "__main__":
    main()
