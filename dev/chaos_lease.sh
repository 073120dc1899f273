#!/bin/bash
# Cross-process writer-lease chaos driver (r19 judge ask #6): N
# iterations of absorb-kill-probe-check against ONE persisted text
# index. Per iteration: a ChaosProbe JVM re-loads and probes across the
# window; a ChaosAbsorb JVM absorbs a fresh batch and is kill -9ed at a
# random delay after ABSORB_START; ChaosCheck then asserts the four
# generational components agree and the live count is exactly pre or
# pre+batch — anything else is a torn read and stops the run.
set -u
cd "$(dirname "$0")/.."
source dev/java_opts.sh
N=${CHAOS_N:-50}
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}
DIR=${SPARK_GRAFT_CHAOS_DIR:-/tmp/graft_chaos/idx}
OUT=${CHAOS_OUT:-/tmp/graft_chaos}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
J="java $ADD_OPENS -Xmx6g -cp $CP"
export SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CHAOS_DIR=$DIR
mkdir -p "$OUT"

rm -rf "$DIR"
$J graft.dev.ChaosAbsorb seed > "$OUT/seed.log" 2>&1 || {
  echo "SEED FAILED"; tail -5 "$OUT/seed.log"; exit 1; }
BATCH=$(grep -o 'rows=[0-9]*' "$OUT/seed.log" | cut -d= -f2)
PRE=$BATCH
echo "seeded: $BATCH docs; batch size per absorb: $BATCH"

torn=0; committed=0; rolled=0
for i in $(seq 1 "$N"); do
  OFF=$((i * 100000000))
  : > "$OUT/absorb_$i.log"
  SPARK_GRAFT_CHAOS_PROBE_SECS=40 \
    $J graft.dev.ChaosProbe > "$OUT/probe_$i.log" 2>&1 &
  PROBE_PID=$!
  SPARK_GRAFT_CHAOS_OFFSET=$OFF \
    $J graft.dev.ChaosAbsorb > "$OUT/absorb_$i.log" 2>&1 &
  ABSORB_PID=$!
  # aim the kill: wait for ABSORB_START, then a random 0-3500 ms
  for _ in $(seq 1 600); do
    grep -q ABSORB_START "$OUT/absorb_$i.log" 2>/dev/null && break
    kill -0 $ABSORB_PID 2>/dev/null || break
    sleep 0.1
  done
  # random 0-25 s after ABSORB_START: an uninterrupted 10k-doc absorb
  # runs ~15-20 s on the local[8] session (the first 8 probe iterations
  # at a 0-9 s ceiling ALL rolled back), so this ceiling lands kills on
  # both sides of the publish — mid-staging rollbacks and post-commit
  # survivals both occur across the run
  sleep 0.$((RANDOM % 10))$((RANDOM % 10))
  sleep $((RANDOM % 25))
  if kill -9 $ABSORB_PID 2>/dev/null; then killed=yes; else killed=no; fi
  wait $ABSORB_PID 2>/dev/null
  wait $PROBE_PID; PROBE_RC=$?
  # let the dead holder's lease go stale (CHAOS_LEASE_MS=2000) before
  # the checker's recover path runs
  sleep 2.5
  $J graft.dev.ChaosCheck > "$OUT/check_$i.log" 2>&1; CHECK_RC=$?
  LIVE=$(grep -o '"live":[0-9]*' "$OUT/check_$i.log" | cut -d: -f2)
  if [ "$PROBE_RC" -ne 0 ]; then
    echo "iter $i: PROBE FAILED rc=$PROBE_RC"; tail -2 "$OUT/probe_$i.log"
    torn=$((torn+1))
  elif [ "$CHECK_RC" -ne 0 ] || [ -z "$LIVE" ]; then
    echo "iter $i: CHECK FAILED rc=$CHECK_RC"; tail -2 "$OUT/check_$i.log"
    torn=$((torn+1))
  elif [ "$LIVE" = "$PRE" ]; then
    rolled=$((rolled+1))
    echo "iter $i: rolled-back (live=$LIVE) killed=$killed $(grep -o 'PROBE_OK.*' "$OUT/probe_$i.log")"
  elif [ "$LIVE" = "$((PRE + BATCH))" ]; then
    committed=$((committed+1)); PRE=$LIVE
    echo "iter $i: committed (live=$LIVE) killed=$killed $(grep -o 'PROBE_OK.*' "$OUT/probe_$i.log")"
  else
    echo "iter $i: TORN live=$LIVE expected $PRE or $((PRE + BATCH))"
    torn=$((torn+1))
  fi
  [ $torn -gt 0 ] && { echo "STOPPING on torn state at iter $i"; break; }
done
echo "chaos summary: N=$i committed=$committed rolled_back=$rolled torn=$torn"
[ $torn -eq 0 ] || exit 1
