#!/bin/bash
# Interleaved same-window A/B of the shingle/band text-dedup family
# (r19 judge ask #1): adjudicate the +13-23% normalized drift seen in
# BENCH_FULL_r19 vs r18 as host tax or a real regression from the r19
# staged-write/union changes.
#
# Method: alternate the r18 close binary (worktree at /tmp/r18wt,
# commit 1eb7284) and the current tree's binary in ONE window, 8
# invocations per side in a counterbalanced ABBABAAB ABBABAAB order,
# REPS=2 per invocation, sf0.1, 32 threads. Each side gets its OWN
# java.io.tmpdir so the persisted index fixtures (keyed by md5 of
# sfDir+fingerprint, format-blind) can never cross binaries. Sentinel
# stats ride in every record; the summary normalizes per-invocation
# by that invocation's own sentinel median AND reports raw, so the
# conclusion doesn't hang on either lens alone.
set -u
cd "$(dirname "$0")/.."
source dev/java_opts.sh
QUERIES="dedup_minhash_lsh,dedup_minhash_fast,dedup_ngram_jaccard,dedup_incremental_lsh_refreshed,text_phrase_indexed"
OUT=${AB_OUT:-/tmp/ab_shingle}
mkdir -p "$OUT" /tmp/abtmp_r18 /tmp/abtmp_r19
A_CP="/tmp/r18wt/target/scala-2.13/classes:/opt/spark/jars/*"
B_CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"

run() { # side(r18|r19) index
  local side=$1 i=$2 cp tmpd
  if [ "$side" = r18 ]; then cp="$A_CP"; tmpd=/tmp/abtmp_r18
  else cp="$B_CP"; tmpd=/tmp/abtmp_r19; fi
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REPS=2 SPARK_GRAFT_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_OUT="$OUT/${side}_$i.json" \
  java $ADD_OPENS -Djava.io.tmpdir=$tmpd -Xmx48g -cp "$cp" graft.Bench \
    > "$OUT/${side}_$i.stdout" 2> "$OUT/${side}_$i.stderr"
  echo "[$(date +%H:%M:%S)] $side #$i rc=$?"
}

# counterbalanced order, 8 invocations per side
i18=0; i19=0
for s in r18 r19 r19 r18 r19 r18 r18 r19 r18 r19 r19 r18 r19 r18 r18 r19; do
  if [ "$s" = r18 ]; then i18=$((i18+1)); run r18 $i18
  else i19=$((i19+1)); run r19 $i19; fi
done
echo DONE
