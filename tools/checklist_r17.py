#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r17 per-key appendix: every gated key with
its baseline and final r17 medians (calib-scaled comparability noted in
the doc), its module, and a status word. Usage:
  checklist_r17.py BASELINE.json FINAL.json > appendix.md
"""
import json
import pathlib, re, sys

OPT = {
    "corpus_bpe_merges": "OPT memo", "corpus_bpe_vocab": "OPT memo",
    "embedding_kmeans": "OPT memo", "dedup_semantic": "OPT memo",
    "embedding_outliers": "OPT memo", "cluster_label_purity": "OPT memo",
    "sample_diverse_cells": "OPT memo",
    "embedding_pq_residual_report": "OPT memo",
    "q21_late_suppliers": "OPT shared exchange",
}


def main():
    base = json.load(open(sys.argv[1]))["queries"]
    fin = json.load(open(sys.argv[2]))["queries"]
    mods = {}
    for line in open(pathlib.Path(__file__).resolve().parent.parent / "LEDGER.md"):
        m = re.match(r"\| `(\w+)` \| `([^`]+)`", line)
        if m:
            mods[m.group(1)] = m.group(2).split(" ")[0]
    print("| key | module | r17 baseline s | r17 final s | status |")
    print("| --- | --- | --- | --- | --- |")
    for k in sorted(fin):
        b = base.get(k, float("nan"))
        status = OPT.get(k, "OK")
        print(f"| `{k}` | `{mods.get(k,'?')}` | {b:.3f} | {fin[k]:.3f} "
              f"| {status} |")


if __name__ == "__main__":
    main()
