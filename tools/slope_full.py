#!/usr/bin/env python3
"""Full-surface decade slope: compare two bench_last-style JSONs
(per-key medians) and flag keys whose growth exceeds a threshold.

Usage: slope_full.py <base.json> <big.json> <dataRatio> [threshold]

A key is flagged when big > threshold * base AND big exceeds a 0.75 s
floor (sub-second keys are fixed-overhead-dominated; their ratios are
scheduling noise, not scaling evidence).
"""
import sys, json

base = json.load(open(sys.argv[1]))["queries"]
big = json.load(open(sys.argv[2]))["queries"]
ratio = float(sys.argv[3])
thresh = float(sys.argv[4]) if len(sys.argv) > 4 else 3.5
rows = []
for k in sorted(base):
    if k not in big or base[k] < 0 or big[k] < 0:
        continue
    r = big[k] / max(base[k], 1e-9)
    rows.append((k, base[k], big[k], r))
flagged = [x for x in rows if x[3] > thresh and x[2] > 0.75]
tot_b = sum(x[1] for x in rows)
tot_g = sum(x[2] for x in rows)
print(f"keys compared: {len(rows)}  base total {tot_b:.1f}s  "
      f"big total {tot_g:.1f}s  ratio {tot_g/tot_b:.2f}x per {ratio}x data")
print(f"flagged (> {thresh}x and > 0.75 s): {len(flagged)}")
for k, b, g, r in sorted(flagged, key=lambda x: -x[3]):
    print(f"  {k}: {b:.2f} -> {g:.2f}  ({r:.2f}x)")
print("\ntop 15 by big-side cost:")
for k, b, g, r in sorted(rows, key=lambda x: -x[2])[:15]:
    print(f"  {k}: {b:.2f} -> {g:.2f}  ({r:.2f}x)")
