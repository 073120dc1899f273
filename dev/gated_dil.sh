#!/bin/bash
# Probe-gated day-in-the-life attempt (r19 judge ask #2): run
# graft.dev.SentinelProbe; only when quiet fire the canonical 5-sink
# 12-trigger day-in-the-life (the BENCH_DAYINLIFE5 configuration: text+
# lex+vector+image+audio maintenance sinks, drift at trigger 6 driving
# retrain/rebuild, auto-compact staggered, stage PAR 8, video arm off).
# Exit 0 = DIL ran (record at $SPARK_GRAFT_DAYINLIFE_OUT, default the
# r20 file), 3 = host not quiet, else probe failure.
cd "$(dirname "$0")/.."
. dev/java_opts.sh
CP="target/scala-2.13/classes:/opt/spark/jars/*"
java $ADD_OPENS -Xmx4g -cp "$CP" graft.dev.SentinelProbe
rc=$?
if [ "$rc" -eq 1 ]; then echo "host not quiet; DIL not fired" >&2; exit 3
elif [ "$rc" -ne 0 ]; then echo "probe FAILED (exit $rc)" >&2; exit "$rc"; fi
exec env \
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}" \
  SPARK_GRAFT_AUTOCOMPACT=300 SPARK_GRAFT_AUTOCOMPACT_STAGGER=130 \
  SPARK_GRAFT_RETRAIN_EVERY=3 SPARK_GRAFT_REBUILD_EVERY=3 \
  SPARK_GRAFT_REBUILD_SAT=0.01 SPARK_GRAFT_DRIFT_AFTER=6 \
  SPARK_GRAFT_STAGE_PAR=8 SPARK_GRAFT_VIDEO=0 \
  SPARK_GRAFT_DAYINLIFE_OUT="${SPARK_GRAFT_DAYINLIFE_OUT:-/root/repo/BENCH_DAYINLIFE5_r20.json}" \
  java $ADD_OPENS -Xmx48g -cp "$CP" graft.dev.DayInLifeStress
