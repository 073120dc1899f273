#!/bin/bash
# Bench harness: run graft.Bench straight from compiled classes so the
# final stdout line is the bare one-line JSON record (no sbt [info]
# prefix — the driver parses the stdout tail).
# Usage: dev/bench.sh [sfDir] ; honors SPARK_GRAFT_CPUS.
set -e
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR=${1:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}
. dev/java_opts.sh
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench
