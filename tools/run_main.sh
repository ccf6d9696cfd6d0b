#!/bin/bash
# Run a graft main against the compiled classes + /opt/spark/jars without
# paying sbt's fork/startup per invocation. Mirrors build.sbt's javaOptions
# (JDK-17 add-opens, UTC session TZ, SPARK_DRIVER_MEM heap).
# Usage: run_main.sh <mainClass> [args...]   (env: SPARK_GRAFT_* passthrough)
set -euo pipefail
MAIN="$1"; shift
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
       java.util java.util.concurrent java.util.concurrent.atomic)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
exec java "${FLAGS[@]}" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
