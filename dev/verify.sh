#!/bin/bash
# Local dev harness: run graft.Verify straight from compiled classes
# (bypasses sbt startup). Usage: dev/verify.sh [sfDir] [outDir]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-/tmp/graft_verify}
. dev/java_opts.sh
rm -rf "$OUT"
exec java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT"
