#!/bin/bash
# Probe-gated full-bench attempt (the r18/r19 "sentinel-gated retry" as
# one command): run graft.dev.SentinelProbe (~20 s); only when its
# 5-measurement median is under the gate (SPARK_GRAFT_PROBE_GATE;
# default 0.60 s at 32 cores, scaled by the probe for other core
# counts) fire the full 196-query bench. Exit codes: 0 = bench ran
# (see BENCH_FULL_LATEST.json), 3 = host not quiet, anything else = the
# PROBE ITSELF failed (compile first; not a tenancy verdict). Run on a
# cadence; commit the calmest record per the selection policy in
# dev/BENCH_NOTES.md.
cd "$(dirname "$0")/.."
. dev/java_opts.sh
java $ADD_OPENS -Xmx4g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.dev.SentinelProbe
rc=$?
if [ "$rc" -eq 0 ]; then
  exec env SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" dev/bench.sh "$@"
elif [ "$rc" -eq 1 ]; then
  echo "host not quiet; bench not fired" >&2
  exit 3
else
  echo "probe FAILED (exit $rc) — an error, not a tenancy verdict" >&2
  exit "$rc"
fi
