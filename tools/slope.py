#!/usr/bin/env python3
"""Slope audit helper: compare per-key bench medians across SF runs.

Usage: slope.py <bench_sfA.json> <bench_sfB.json> [<bench_sfC.json> ...]

Each file is a Bench `bench_last.json` (full per-query medians). Prints
totals, the ratio of totals between consecutive files, and the keys
with the steepest last-step slope (ratio of medians), ignoring keys
missing from either run or with sub-50ms baselines (ratio noise).
"""
import sys, json


def load(p):
    with open(p) as f:
        d = json.load(f)
    return d.get("sf", p), d["value"], d["queries"], d.get("calib_sec")


def main():
    runs = [load(p) for p in sys.argv[1:]]
    print("totals:")
    prev = None
    for sf, total, qs, calib in runs:
        ratio = f"  ({total / prev:.2f}x vs prev)" if prev else ""
        cal = f", calib {calib}s" if calib is not None else ""
        print(f"  {sf}: {total:.1f} s over {len(qs)} keys{cal}{ratio}")
        prev = total
    if len(runs) >= 2:
        (_, _, qa, _), (_, _, qb, _) = runs[-2], runs[-1]
        common = [k for k in qb if k in qa and qa[k] >= 0.05 and qb[k] >= 0]
        slopes = sorted(((qb[k] / qa[k], k, qa[k], qb[k]) for k in common),
                        reverse=True)
        print(f"\nsteepest last-step slopes ({len(common)} comparable keys):")
        for r, k, a, b in slopes[:15]:
            print(f"  {k}: {a:.2f} -> {b:.2f} s ({r:.2f}x)")
        flat = sum(1 for r, *_ in slopes if r <= 1.5)
        lin = sum(1 for r, *_ in slopes if 1.5 < r <= 11)
        sup = [(k, r) for r, k, _, _ in slopes if r > 11]
        print(f"  distribution: {flat} flat (<=1.5x), {lin} linear-ish, "
              f"{len(sup)} super-linear (>11x): {sup}")


if __name__ == "__main__":
    main()
