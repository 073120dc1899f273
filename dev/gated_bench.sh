#!/bin/bash
# Probe-gated full-bench attempt (the r18/r19 "sentinel-gated retry" as
# one command): run graft.dev.SentinelProbe (~20 s); only when its
# 5-measurement median is under the gate (SPARK_GRAFT_PROBE_GATE,
# default 0.60 s at 32 cores) fire the full 196-query bench. Exit codes:
# 0 = bench ran (see BENCH_FULL_LATEST.json), 3 = host not quiet, probe
# JSON printed either way. Run on a cadence; commit the calmest record
# per the selection policy in dev/BENCH_NOTES.md.
set -e
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
if java $ADD_OPENS -Xmx4g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.dev.SentinelProbe; then
  exec env SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    dev/bench.sh "${1:-/root/testdata/sf0.1}"
else
  echo "host not quiet; bench not fired" >&2
  exit 3
fi
