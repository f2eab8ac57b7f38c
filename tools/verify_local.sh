#!/bin/bash
# Local verify+oracle gate for a query subset (dev tool; the driver has
# its own harness). Usage:
#   tools/verify_local.sh <sfDir> <outDir> [q1,q2,...]
# Runs graft.Verify on the compiled classes against <sfDir>, then the
# DuckDB comparison. Compile first (sbt compile).
set -e
SF="${1:?sfDir}"; OUT="${2:?outDir}"; ONLY="${3:-}"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
cd "$(dirname "$0")/.."
env ${ONLY:+SPARK_GRAFT_ONLY=$ONLY} java -XX:+IgnoreUnrecognizedVMOptions $OPENS \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" 2>"$OUT.err" | tail -40
python3 tools/check_oracle.py "$SF" "$OUT"
