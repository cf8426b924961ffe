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
    return data.get("parsed", data)


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
    if len(sys.argv) == 3:
        old_path, new_path = sys.argv[1], sys.argv[2]
    else:
        old_path, new_path = newest_two()
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]

    rows = []
    for name in sorted(set(oq) & set(nq)):
        d = nq[name] - oq[name]
        pct = 100.0 * d / oq[name] if oq[name] else 0.0
        rows.append((d, pct, name))
    rows.sort(reverse=True)

    w = max((len(r[2]) for r in rows), default=10)
    print(f"{os.path.basename(old_path)} -> {os.path.basename(new_path)}")
    print(f"{'query':<{w}}  {'old':>7}  {'new':>7}  {'delta':>7}  {'pct':>7}")
    regressed = []
    for d, pct, name in rows:
        flag = " <-- regressed" if d > REG_THRESHOLD else ""
        print(f"{name:<{w}}  {oq[name]:>7.3f}  {nq[name]:>7.3f}  {d:>+7.3f}  {pct:>+6.1f}%{flag}")
        if d > REG_THRESHOLD:
            regressed.append(name)

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("added:  ", ", ".join(f"{n} ({nq[n]:.3f}s)" for n in added))
    if removed:
        print("removed:", ", ".join(removed))
    t_old = sum(oq[n] for n in set(oq) & set(nq))
    t_new = sum(nq[n] for n in set(oq) & set(nq))
    print(f"shared-query total: {t_old:.3f}s -> {t_new:.3f}s ({t_new - t_old:+.3f}s)")
    if "stream_events_per_sec" in old and "stream_events_per_sec" in new:
        print(
            f"stream events/s: {old['stream_events_per_sec']:,.0f} -> "
            f"{new['stream_events_per_sec']:,.0f}"
        )
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
