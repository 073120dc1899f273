#!/bin/bash
# Concurrent-Stager stress harness: reproduce/regress the pooled-scratch
# staged-write race (r16 bench tail). Usage: dev/stager_stress.sh [iters] [par]
set -e
cd "$(dirname "$0")/.."
export SPARK_GRAFT_STAGER_ITERS=${1:-12}
export SPARK_GRAFT_STAGE_PAR=${2:-8}
. dev/java_opts.sh
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.dev.StagerStress
