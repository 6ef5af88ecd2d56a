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
# Staleness gate (round-11 ADVICE, medium): a fuzz/matrix sweep after a
# source edit would otherwise silently certify OLD classes — the gate
# reads green while testing code that no longer exists. Compare the
# newest src/main .scala mtime against the newest compiled .class and
# refuse to run stale. GRAFT_CLASSES is exempt BY DESIGN: it points at
# an explicitly frozen snapshot taken so long sweeps don't race a
# recompile (the caller asserted which code they are testing).
if [ -z "${GRAFT_CLASSES:-}" ]; then
  src_m="$(find "$REPO/src/main" -name '*.scala' -printf '%T@\n' 2>/dev/null | sort -rn | head -1)"
  # build.sbt touches this stamp on EVERY successful compile (incl.
  # zinc no-ops, which do not rewrite .class files); fall back to the
  # newest .class mtime for snapshots that predate the stamp
  if [ -f "$REPO/target/graft_compile_stamp" ]; then
    cls_m="$(stat -c '%Y' "$REPO/target/graft_compile_stamp")"
  else
    cls_m="$(find "$CLASSES" -name '*.class' -printf '%T@\n' 2>/dev/null | sort -rn | head -1)"
  fi
  if [ -n "$src_m" ] && { [ -z "$cls_m" ] || awk -v s="$src_m" -v c="$cls_m" 'BEGIN{exit !(s>c)}'; }; then
    echo "STALE CLASSES: src/main has a .scala newer than the last successful sbt compile — run sbt compile (or set GRAFT_CLASSES to a frozen snapshot)" >&2
    exit 2
  fi
fi
SCALA_LIB="$(ls "$HOME"/.cache/coursier/v1/https/*/org/scala-lang/scala-library/*/scala-library-*.jar 2>/dev/null | head -1 || true)"
# /opt/spark/jars already ships the scala library; only add a cached one
# if spark's copy is somehow absent
CP="$CLASSES:/opt/spark/jars/*"
# Probe mains (StageRetryProbe, StreamLossProbe, ...) live in
# test-classes since round 13 (ADVICE: keep fault-injection harness out
# of the shipped jar); append when built so run_main.sh can still
# launch them. scalatest jars aren't needed — probes are plain mains.
TEST_CLASSES="${GRAFT_TEST_CLASSES:-$REPO/target/scala-2.13/test-classes}"
[ -d "$TEST_CLASSES" ] && CP="$CP:$TEST_CLASSES"
if ! ls /opt/spark/jars/scala-library-*.jar >/dev/null 2>&1; then
  [ -n "$SCALA_LIB" ] || { echo "scala-library jar not found in /opt/spark/jars or the coursier cache" >&2; exit 2; }
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
