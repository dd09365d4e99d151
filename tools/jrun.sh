#!/bin/bash
# Run a graft main class directly on the compiled classes + Spark jars
# (avoids sbt's single-server lock during long scale runs).
# Usage: tools/jrun.sh <mainClass> [args...]   (env vars pass through)
cd "$(dirname "$0")/.." || exit 1
exec java -Xmx${GRAFT_XMX:-96g} -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  --add-modules=jdk.incubator.vector \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  "$@"
