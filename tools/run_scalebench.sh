#!/bin/bash
# Run graft.ScaleBench outside sbt (same JVM flags build.sbt injects).
# Usage: run_scalebench.sh <replicas> <scaleDir> [extra env via environment]
#   SPARK_GRAFT_ONLY / SPARK_GRAFT_RUNS / SPARK_GRAFT_CPUS pass through.
set -euo pipefail
export SPARK_GRAFT_REPLICAS="$1" SPARK_GRAFT_SCALE_DIR="$2"
export SPARK_GRAFT_FORK="${SPARK_GRAFT_FORK:-1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" \
  graft.ScaleBench < /dev/null 2>/dev/null
