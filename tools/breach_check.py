#!/usr/bin/env python3
"""Cross-session per-key breach check, calib-normalized (round-16 #6).

Usage: breach_check.py PREV.json CURR.json [--raw]

Reads two Bench full-record files (bench_last.json format or the
driver's BENCH_r{N}.json), rescales every median by calib_ref/calib_sec
(reference-box seconds), and applies the breach rule
    curr > max(2 * prev, prev + 0.5)
to the SCALED series. --raw applies it to raw medians instead (the
driver-graded numbers). Older records without queries_cal are scaled
here from their own calib_sec, so any two rounds compare.

Exit 0 = no breaches; exit 1 = breaches listed on stdout.
"""
import json, sys

CALIB_REF = 0.591  # round-16 committed session; must match Bench.scala


def load(path, raw):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver wrapper (BENCH_r{N}.json)
        d = d["parsed"]
    qs = d.get("queries", {})
    if raw:
        return {k: v for k, v in qs.items() if v >= 0}, d
    if "queries_cal" in d and len(d["queries_cal"]) >= len(qs):
        return {k: v for k, v in d["queries_cal"].items() if v >= 0}, d
    calib = d.get("calib_sec", -1)
    scale = CALIB_REF / calib if calib and calib > 0 else 1.0
    return {k: v * scale for k, v in qs.items() if v >= 0}, d


def main():
    raw = "--raw" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    prev, dp = load(args[0], raw)
    curr, dc = load(args[1], raw)
    common = sorted(set(prev) & set(curr))
    mode = "raw" if raw else "calib-scaled"
    print(f"# {mode}: prev calib={dp.get('calib_sec')} "
          f"curr calib={dc.get('calib_sec')} common={len(common)}")
    breaches = []
    for k in common:
        p, c = prev[k], curr[k]
        if c > max(2 * p, p + 0.5):
            breaches.append((k, p, c))
    for k, p, c in sorted(breaches, key=lambda t: t[2] / max(t[1], 1e-9),
                          reverse=True):
        print(f"BREACH {k}: {p:.3f} -> {c:.3f} ({c / max(p, 1e-9):.2f}x)")
    print(f"# breaches: {len(breaches)}")
    sys.exit(1 if breaches else 0)


if __name__ == "__main__":
    main()
