#!/bin/bash
# Run a graft main (graft.Verify / graft.Bench / ...) with plain `java`
# against the sbt-compiled classes — no sbt lock, so long verify/bench
# sweeps can run in parallel with compiles and with each other. Mirrors
# build.sbt's fork settings (JDK17 add-opens, UTC, UI off, heap from
# SPARK_DRIVER_MEM). Extra Spark confs go through the main's own env
# hooks (SPARK_GRAFT_*), not here.
#
# Usage: tools/run_main.sh <MainClass> [args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# GRAFT_CLASSES overrides for FROZEN-SNAPSHOT runs: a long background
# sweep must not race an sbt recompile rewriting class files under it —
# cp -r the classes dir and point the sweep here.
CLASSES="${GRAFT_CLASSES:-$REPO/target/scala-2.13/classes}"
[ -d "$CLASSES" ] || { echo "run sbt compile first" >&2; exit 2; }
SCALA_LIB="$(ls "$HOME"/.cache/coursier/v1/https/*/org/scala-lang/scala-library/*/scala-library-*.jar 2>/dev/null | head -1 || true)"
# /opt/spark/jars already ships the scala library; only add a cached one
# if spark's copy is somehow absent
CP="$CLASSES:/opt/spark/jars/*"
if ! ls /opt/spark/jars/scala-library-*.jar >/dev/null 2>&1; then
  CP="$CP:$SCALA_LIB"
fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
