#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r18 per-key appendix: every gated key with
its baseline and final r18 medians, its module, and a status word.
Usage: checklist_r18.py BASELINE.json FINAL.json > appendix.md
"""
import json
import pathlib, re, sys

OPT = {
    "q2_min_cost_supplier": "OPT bloom (gated)",
    "q19_disjunctive": "OPT bloom (gated)",
    "q17_small_qty_revenue": "OPT window + bloom (gated)",
    "parts_hits_bipartite": "OPT SHJ rounds (gated, marginal)",
    "events_stream_dedup_ids": "OPT state parts (chunked tier)",
    "events_stream_click_attrib": "OPT state parts (chunked tier)",
    "layout_bucketed_join": "OPT one file/bucket",
    "dedup_jaccard_topk": "ATTRIBUTED (fusion tried, reverted)",
    "dedup_method_agreement_capped": "ATTRIBUTED (sig-colocation floor)",
}


def main():
    base = json.load(open(sys.argv[1]))["queries"]
    fin = json.load(open(sys.argv[2]))["queries"]
    mods = {}
    for line in open(pathlib.Path(__file__).resolve().parent.parent / "LEDGER.md"):
        m = re.match(r"\| `(\w+)` \| `([^`]+)`", line)
        if m:
            mods[m.group(1)] = m.group(2).split(" ")[0]
    print("| key | module | r18 baseline s | r18 final s | status |")
    print("| --- | --- | --- | --- | --- |")
    for k in sorted(fin):
        b = base.get(k, float("nan"))
        status = OPT.get(k, "OK")
        print(f"| `{k}` | `{mods.get(k,'?')}` | {b:.3f} | {fin[k]:.3f} "
              f"| {status} |")


if __name__ == "__main__":
    main()
