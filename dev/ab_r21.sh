#!/bin/bash
# Same-window A/B of this round's touched query paths: old = the
# pre-change r20-close binary (snapshotted classes), new = the current
# tree. Counterbalanced ABBABAAB x2 in one window, REPS=3 (rep 1 pays
# any session-once memo fills; min-of-3 is the steady state the bench
# reports), sf0.1, 32 threads, per-side tmpdirs so index fixtures never
# cross binaries. Sentinel stats ride in every record.
set -u
cd "$(dirname "$0")/.."
source dev/java_opts.sh
QUERIES=${AB_QUERIES:-"retrieval_hybrid_rrf_phrase,retrieval_e2e,retrieval_e2e_indexed,retrieval_hybrid_recall,retrieval_hybrid_rrf_indexed,retrieval_hybrid_rrf_ivf_indexed,text_bm25_indexed,text_bm25_indexed_refreshed,text_phrase_indexed,text_phrase_indexed_refreshed,text_proximity_indexed,text_profile,text_quality_topk,corpus_source_mix,text_quality_filter,dedup_minhash_lsh,dedup_incremental_lsh,dedup_ngram_jaccard,dedup_lsh_recall,ann_ivf_sq8_indexed_topk,ann_pq_indexed_topk"}
OUT=${AB_OUT:-/tmp/ab_r21}
mkdir -p "$OUT" /tmp/abtmp_old /tmp/abtmp_new
A_CP="/tmp/r21_old_classes:/opt/spark/jars/*"
B_CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"

run() { # side(old|new) index
  local side=$1 i=$2 cp tmpd
  if [ "$side" = old ]; then cp="$A_CP"; tmpd=/tmp/abtmp_old
  else cp="$B_CP"; tmpd=/tmp/abtmp_new; fi
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_OUT="$OUT/${side}_$i.json" \
  java $ADD_OPENS -Djava.io.tmpdir=$tmpd -Xmx48g -cp "$cp" graft.Bench \
    > "$OUT/${side}_$i.stdout" 2> "$OUT/${side}_$i.stderr"
  echo "[$(date +%H:%M:%S)] $side #$i rc=$?"
}

iA=0; iB=0
for s in old new new old new old old new old new new old new old old new; do
  if [ "$s" = old ]; then iA=$((iA+1)); run old $iA
  else iB=$((iB+1)); run new $iB; fi
done
echo DONE
