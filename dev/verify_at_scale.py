#!/usr/bin/env python3
"""Oracle-gate a rotating subset of declared queries at sf0.1.

Every declared query is DuckDB-gated at sf0.01 each round; scale-dependent
bugs (quantization overflow, window ties, bucket-cap boundaries) can hide
below that. This picks the K cheapest-at-sf0.1 oracle-backed queries from
the official bench min map (BENCH_FULL_LATEST.json), runs them through
graft.dev.RunQueries on the sf0.1 tables, gates them with dev/compare.py,
and writes a committed artifact. The `offset` argument rotates the window
through the cost-sorted list so successive rounds sweep different slices.

Usage: dev/verify_at_scale.py [K=20] [offset=0] [artifact=VERIFY_SF01.json]
   or: dev/verify_at_scale.py q1,q2,... [ignored] [artifact]   (explicit set)
"""
import json, os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.1"
OUT = "/tmp/graft_verify_sf01"
EXPLICIT = None
if len(sys.argv) > 1 and not sys.argv[1].isdigit():
    EXPLICIT = sys.argv[1].split(",")
if EXPLICIT is None:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    OFFSET = int(sys.argv[2]) if len(sys.argv) > 2 else 0
else:
    K, OFFSET = 0, 0  # second positional is ignored in explicit mode
ARTIFACT = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
    REPO, "VERIFY_SF01.json")

bench = json.load(open(os.path.join(REPO, "BENCH_FULL_LATEST.json")))
min_map = bench["queries"]  # stat:"min" per-query seconds at sf0.1

# the oracle-backed declared set = the NEWEST full-verify dump on this
# host (any /tmp/graft_verify*/oracle_sql.json — fixed-path candidates
# silently served a stale r14-era set once verify outputs moved to
# suffixed dirs, which dropped every same-round query addition from the
# rotating gate)
import glob
cands = sorted(glob.glob("/tmp/graft_verify*/oracle_sql.json"),
               key=os.path.getmtime, reverse=True)
if not cands:
    sys.exit("run dev/verify.sh once first (need oracle_sql.json "
             "to know the declared oracle-backed set)")
oracle_src = json.load(open(cands[0]))
# guard against a PARTIAL dump (a targeted RunQueries re-run writes a
# subset oracle_sql.json — picking it by mtime would silently shrink the
# gate's universe): prefer the largest dump among candidates whose set
# covers at least the bench map's oracle-backed portion, warn otherwise
covered = sum(1 for q in min_map if q in oracle_src)
best = max(cands, key=lambda p: len(json.load(open(p))))
best_src = json.load(open(best))
if len(best_src) > len(oracle_src):
    print(f"note: newest dump {cands[0]} has {len(oracle_src)} queries but "
          f"{best} has {len(best_src)} — using the larger (fuller) dump")
    oracle_src = best_src
    covered = sum(1 for q in min_map if q in oracle_src)
print(f"oracle set: {len(oracle_src)} declared, {covered} also in bench map")

ranked = [q for q, _ in sorted(min_map.items(), key=lambda kv: kv[1])
          if q in oracle_src]
if not ranked:
    sys.exit("no oracle-backed queries found in the bench min map")
window = (EXPLICIT if EXPLICIT is not None else
          [ranked[(OFFSET + i) % len(ranked)]
           for i in range(min(K, len(ranked)))])

add_opens = []
for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
          "sun.security.action", "sun.util.calendar"]:
    add_opens += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]

t0 = time.time()
subprocess.run(["rm", "-rf", OUT], check=True)
run = subprocess.run(
    ["java", *add_opens, "-Xmx8g", "-Dspark.ui.enabled=false",
     "-Dspark.sql.session.timeZone=UTC",
     "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
     "graft.dev.RunQueries", SF, OUT, *window],
    capture_output=True, text=True)
if run.returncode != 0:
    print(run.stdout[-4000:], run.stderr[-4000:])
    sys.exit(f"RunQueries failed rc={run.returncode}")
spark_s = round(time.time() - t0, 1)

t1 = time.time()
cmp = subprocess.run(
    [sys.executable, os.path.join(REPO, "dev", "compare.py"), SF, OUT],
    capture_output=True, text=True)
print(cmp.stdout)
oracle_s = round(time.time() - t1, 1)

lines = [l for l in cmp.stdout.splitlines() if l[:4] in ("OK  ", "FAIL")]
detail = {}
for l in lines:
    name = l.split()[1].rstrip(":")
    detail[name] = "ok" if l.startswith("OK") else "FAIL " + l
ok = sum(1 for v in detail.values() if v == "ok")

artifact = {
    "sf": 0.1, "k": len(window), "offset": OFFSET,
    "selection": ("explicit list" if EXPLICIT is not None else
                  "cheapest-at-sf0.1 by BENCH_FULL_LATEST min map, "
                  "rotated by offset"),
    "pass": ok, "fail": len(detail) - ok,
    "spark_sec": spark_s, "oracle_sec": oracle_s,
    "queries": detail,
}
with open(ARTIFACT, "w") as f:
    json.dump(artifact, f, indent=1, sort_keys=True)
print(f"wrote {ARTIFACT}: {ok}/{len(detail)} match at sf0.1")
sys.exit(0 if cmp.returncode == 0 else 1)
