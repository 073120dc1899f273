#!/bin/bash
# Pinned cross-round A/B of the MinHash/LSH shingle-band family
# (r20 judge ask #2): the family drifted upward two driver rounds in a
# row (r18→r19 +13-23% normalized, r19→r20 +25-65% raw) and both times
# the builder adjudicated it cross-window as noise; this run puts the
# EXACT r19-baseline binary (commit 08b6ce8 — the tree the driver's
# r19 bench measured, built in a worktree) and the current tree's
# binary in ONE window, counterbalanced ABBABAAB x2, REPS=2, sf0.1,
# 32 threads. Per-invocation sentinel stats ride in every record so
# the summary can normalize per-window; each side gets its OWN
# java.io.tmpdir so persisted index fixtures never cross binaries.
set -u
cd "$(dirname "$0")/.."
source dev/java_opts.sh
QUERIES="dedup_minhash_lsh,dedup_minhash_fast,dedup_ngram_jaccard,dedup_incremental_lsh,dedup_incremental_lsh_refreshed,dedup_lsh_recall"
OUT=${AB_OUT:-/tmp/ab_minhash_r21}
mkdir -p "$OUT" /tmp/abtmp_r19b /tmp/abtmp_r21b
A_CP="/tmp/r19wt/target/scala-2.13/classes:/opt/spark/jars/*"
B_CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"

run() { # side(r19|r21) index
  local side=$1 i=$2 cp tmpd
  if [ "$side" = r19 ]; then cp="$A_CP"; tmpd=/tmp/abtmp_r19b
  else cp="$B_CP"; tmpd=/tmp/abtmp_r21b; fi
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REPS=2 SPARK_GRAFT_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_OUT="$OUT/${side}_$i.json" \
  java $ADD_OPENS -Djava.io.tmpdir=$tmpd -Xmx48g -cp "$cp" graft.Bench \
    > "$OUT/${side}_$i.stdout" 2> "$OUT/${side}_$i.stderr"
  echo "[$(date +%H:%M:%S)] $side #$i rc=$?"
}

i19=0; i21=0
for s in r19 r21 r21 r19 r21 r19 r19 r21 r19 r21 r21 r19 r21 r19 r19 r21; do
  if [ "$s" = r19 ]; then i19=$((i19+1)); run r19 $i19
  else i21=$((i21+1)); run r21 $i21; fi
done
echo DONE
