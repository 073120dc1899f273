#!/usr/bin/env python3
"""Round-over-round bench comparison using each query's own noise band.

The host is co-tenant noisy: single min-to-min deltas re-litigate
tenancy every round. BENCH_FULL_*.json records per-query min / median /
max across the reps, so a query only deserves attention when its new
MIN lands OUTSIDE the previous round's [min, max] band (stretched by
`margin` for cross-run jitter the within-run band can't see).

Usage: dev/bench_compare.py OLD.json NEW.json [margin=1.15]
Prints the flagged table + summary; exit 0 always (informational).
"""
import json, sys

if len(sys.argv) < 3:
    sys.exit(__doc__)
old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
margin = float(sys.argv[3]) if len(sys.argv) > 3 else 1.15

o_min, o_max = old["queries"], old.get("queries_max", old["queries"])
n_min = new["queries"]
common = sorted(set(o_min) & set(n_min))
added = sorted(set(n_min) - set(o_min))
removed = sorted(set(o_min) - set(n_min))

slower, faster = [], []
for q in common:
    if n_min[q] > o_max[q] * margin:
        slower.append((n_min[q] / o_min[q], q))
    elif n_min[q] < o_min[q] / margin:
        faster.append((n_min[q] / o_min[q], q))

print(f"common {len(common)}  added {len(added)}  removed {len(removed)}"
      f"  margin ×{margin}")
tot_o = sum(o_min[q] for q in common)
tot_n = sum(n_min[q] for q in common)
ratios = sorted(n_min[q] / o_min[q] for q in common)
med = ratios[len(ratios) // 2]
print(f"common-query min totals: {tot_o:.1f}s -> {tot_n:.1f}s"
      f"  (median per-query ratio {med:.3f})")
if added:
    print(f"added: {', '.join(added)}"
          f"  (+{sum(n_min[q] for q in added):.1f}s)")
if removed:
    print(f"removed: {', '.join(removed)}")

def table(title, rows):
    if not rows:
        print(f"\n{title}: none outside band")
        return
    print(f"\n{title}:")
    print(f"  {'query':42} {'old min':>8} {'old max':>8} {'new min':>8} {'ratio':>6}")
    for r, q in sorted(rows, reverse=(title.startswith('slower'))):
        print(f"  {q:42} {o_min[q]:8.2f} {o_max[q]:8.2f}"
              f" {n_min[q]:8.2f} {r:6.2f}")

table("slower than old band", slower)
table("faster than old band", faster)
