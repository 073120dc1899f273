#!/usr/bin/env python3
"""Summarize dev/ab_shingle.sh output: per-query raw and
sentinel-normalized stats for the r18 vs r19(current) interleaved A/B.
Reads /tmp/ab_shingle/{r18,r19}_*.json (one bench record per
invocation, REPS=2, min-of-2 per query), prints a markdown table and a
verdict per query: the r19/r18 ratio of median-of-invocation-mins, raw
and normalized by each invocation's own sentinel median."""
import glob
import json
import statistics as st
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_shingle"


def load(side):
    recs = []
    for f in sorted(glob.glob(f"{OUT}/{side}_*.json")):
        with open(f) as fh:
            recs.append(json.load(fh))
    return recs


sides = {s: load(s) for s in ("r18", "r19")}
queries = sorted(sides["r18"][0]["queries"].keys())

print(f"invocations: r18={len(sides['r18'])} r19={len(sides['r19'])}")
for s in ("r18", "r19"):
    meds = [r["sentinel"]["median"] for r in sides[s]]
    print(f"{s} sentinel medians: "
          + ", ".join(f"{m:.3f}" for m in meds)
          + f"  (median {st.median(meds):.3f})")

print("\n| query | r18 raw | r19 raw | ratio | r18 norm | r19 norm |"
      " ratio | verdict |")
print("|---|---|---|---|---|---|---|---|")
worst = 0.0
for q in queries:
    vals = {}
    for s in ("r18", "r19"):
        raw = [r["queries"][q] for r in sides[s]]
        norm = [r["queries"][q] * 0.550 / r["sentinel"]["median"]
                for r in sides[s]]
        vals[s] = (st.median(raw), st.median(norm))
    rr = vals["r19"][0] / vals["r18"][0]
    rn = vals["r19"][1] / vals["r18"][1]
    worst = max(worst, min(rr, rn))
    verdict = ("regression" if min(rr, rn) > 1.10
               else "faster" if max(rr, rn) < 0.90 else "flat")
    print(f"| {q} | {vals['r18'][0]:.3f} | {vals['r19'][0]:.3f} |"
          f" {rr:.2f} | {vals['r18'][1]:.3f} | {vals['r19'][1]:.3f} |"
          f" {rn:.2f} | {verdict} |")
print(f"\nfamily verdict: {'REGRESSION' if worst > 1.10 else 'noise/flat'}"
      f" (worst min(raw,norm) ratio {worst:.2f};"
      " >1.10 on BOTH lenses = regression)")
