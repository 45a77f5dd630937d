#!/bin/bash
# Run a graft main class against the compiled classes WITHOUT sbt (keeps the
# sbt lock free for concurrent test runs, and spares sbt's JVM startup).
# Usage: tools/run_main.sh graft.Scaling [args...]
# Env: SPARK_DRIVER_MEM (default 20g) plus all SPARK_GRAFT_* knobs.
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS="java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
java.util java.util.concurrent java.util.concurrent.atomic \
sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar"
FLAGS=()
for p in $OPENS; do FLAGS+=("--add-opens" "java.base/$p=ALL-UNNAMED"); done
# THP and AlwaysPreTouch deliberately NOT enabled: on this VM first-touch
# page faults exit to the hypervisor (~75-150 MB/s aggregate) and madvised
# huge pages add direct compaction — pre-touching a multi-GB heap costs
# MINUTES of kernel time before main() even runs (see Bench.spawn).
exec java "${FLAGS[@]}" \
  -Xms"${SPARK_DRIVER_MEM:-20g}" -Xmx"${SPARK_DRIVER_MEM:-20g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" "$@"
