#!/bin/bash
# Build target/spark_home_shim: a SPARK_HOME whose contents symlink the
# real /opt/spark distro but whose directory itself is repo-writable.
# Needed by local-cluster mode (config_matrix's local_cluster cell and
# graft.StageRetryProbe): the standalone Worker hardcodes its executor
# work dir to $SPARK_HOME/work with no conf override, and /opt/spark
# must stay untouched. Idempotent.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SHIM="$REPO/target/spark_home_shim"
mkdir -p "$SHIM"
for d in jars bin sbin conf python R data licenses kubernetes yarn \
         examples RELEASE LICENSE NOTICE README.md; do
  [ -e "$SHIM/$d" ] || ln -s "/opt/spark/$d" "$SHIM/$d"
done
echo "$SHIM"
