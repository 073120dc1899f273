#!/usr/bin/env python3
"""Summarize dev/ab_minhash_r21.sh output: per-query raw and
sentinel-normalized stats for the r19-baseline vs r21(current)
interleaved A/B. Reads /tmp/ab_minhash_r21/{r19,r21}_*.json (one bench
record per invocation, REPS=2, min-of-2 per query), prints a markdown
table and a verdict per query: the r21/r19 ratio of
median-of-invocation-mins, raw and normalized by each invocation's own
sentinel median."""
import glob
import json
import statistics as st
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_minhash_r21"
SIDES = ("r19", "r21")


def load(side):
    recs = []
    for f in sorted(glob.glob(f"{OUT}/{side}_*.json")):
        with open(f) as fh:
            recs.append(json.load(fh))
    return recs


sides = {s: load(s) for s in SIDES}
queries = sorted(sides[SIDES[0]][0]["queries"].keys())

print(f"invocations: " + " ".join(f"{s}={len(sides[s])}" for s in SIDES))
for s in SIDES:
    meds = [r["sentinel"]["median"] for r in sides[s]]
    print(f"{s} sentinel medians: "
          + ", ".join(f"{m:.3f}" for m in meds)
          + f"  (median {st.median(meds):.3f})")

a, b = SIDES
print(f"\n| query | {a} raw | {b} raw | ratio | {a} norm | {b} norm |"
      " ratio | verdict |")
print("|---|---|---|---|---|---|---|---|")
worst = 0.0
for q in queries:
    vals = {}
    for s in SIDES:
        raw = [r["queries"][q] for r in sides[s]]
        norm = [r["queries"][q] * 0.550 / r["sentinel"]["median"]
                for r in sides[s]]
        vals[s] = (st.median(raw), st.median(norm))
    rr = vals[b][0] / vals[a][0]
    rn = vals[b][1] / vals[a][1]
    worst = max(worst, min(rr, rn))
    verdict = ("regression" if min(rr, rn) > 1.10
               else "faster" if max(rr, rn) < 0.90 else "flat")
    print(f"| {q} | {vals[a][0]:.3f} | {vals[b][0]:.3f} |"
          f" {rr:.2f} | {vals[a][1]:.3f} | {vals[b][1]:.3f} |"
          f" {rn:.2f} | {verdict} |")
print(f"\nfamily verdict: {'REGRESSION' if worst > 1.10 else 'noise/flat'}"
      f" (worst min(raw,norm) ratio {worst:.2f};"
      " >1.10 on BOTH lenses = regression)")
