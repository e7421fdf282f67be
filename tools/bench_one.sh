#!/bin/bash
# Run graft.BenchOne outside sbt (same JVM flags as build.sbt) so a
# scale-rehearsal sweep doesn't pay sbt startup per query.
# Usage: SPARK_GRAFT_SF_DIR=... bench_one.sh <query> [passes]
set -euo pipefail
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.BenchOne "$@"
