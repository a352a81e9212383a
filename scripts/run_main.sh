#!/bin/bash
# Run a graft main directly against the compiled classes + the shipped
# Spark jars (exactly build.sbt's fork config) — lets a MiniBench/Verify
# run proceed while sbt itself is busy (e.g. a test pass).
# Usage: scripts/run_main.sh <mainClass> [args...]
# Repo root derived from this script's location (round-18 ADVICE);
# SPARK_JARS overrides the Spark jar dir if it is not /opt/spark/jars.
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SPARK_JARS="${SPARK_JARS:-/opt/spark/jars}"
MAIN="$1"; shift
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$REPO_ROOT/target/scala-2.13/classes:$SPARK_JARS/*" \
  "$MAIN" "$@"
