#!/usr/bin/env python3
"""Per-query diff of two bench medians files (dev tool).

Usage: python3 tools/bench_diff.py BENCH_r11_medians.json BENCH_r12_medians.json [threshold_s]

Prints entries added/removed and any query whose median moved by more
than threshold_s (default 0.25 s), plus the total / io / artifact
summary deltas. The medians files are the committed per-round
`BENCH_r<N>_medians.json` artifacts (written by Bench as
`BENCH_latest_medians.json` on every full-catalog run).
"""
import json
import sys

if len(sys.argv) < 3:
    sys.exit(__doc__)
a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25

qa, qb = a["queries"], b["queries"]
added = sorted(set(qb) - set(qa))
removed = sorted(set(qa) - set(qb))
moved = sorted(
    ((k, qa[k], qb[k]) for k in set(qa) & set(qb) if abs(qb[k] - qa[k]) > thr),
    key=lambda t: -(abs(t[2] - t[1])),
)

print(f"A: {sys.argv[1]}  total={a['value']:.1f}s  n={len(qa)}  "
      f"io={a.get('io_sec', 0):.1f}  artifact={a.get('artifact_sec', 'n/a')}")
print(f"B: {sys.argv[2]}  total={b['value']:.1f}s  n={len(qb)}  "
      f"io={b.get('io_sec', 0):.1f}  artifact={b.get('artifact_sec', 'n/a')}")
if added:
    print(f"\nadded ({len(added)}):")
    for k in added:
        print(f"  + {k:32s} {qb[k]:7.2f}s")
if removed:
    print(f"\nremoved ({len(removed)}):")
    for k in removed:
        print(f"  - {k:32s} {qa[k]:7.2f}s")
print(f"\nmoved > {thr}s ({len(moved)}):")
for k, va, vb in moved:
    print(f"  {k:34s} {va:7.2f} -> {vb:7.2f}  ({vb - va:+.2f})")
common = set(qa) & set(qb)
print(f"\ncommon-entry total: {sum(qa[k] for k in common):.1f} -> "
      f"{sum(qb[k] for k in common):.1f}s over {len(common)} queries")
