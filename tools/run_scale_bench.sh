#!/bin/bash
# Scale-bench launcher (round-14 method, see bench-method in memory):
# plain-java run on a snapshotted class tree so sbt never holds the
# lock or steals CPU from a timing pass.
#   usage: run_scale_bench.sh <classes_dir> <sf_dir> <out_json> [only] [base_json]
set -e
CLASSES="$1"; SFDIR="$2"; OUT="$3"; ONLY="${4:-}"; BASE="${5:-}"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_SF_DIR="$SFDIR"
export SPARK_GRAFT_BENCH_OUT="$OUT"
[ -n "$ONLY" ] && export SPARK_GRAFT_BENCH_ONLY="$ONLY"
[ -n "$BASE" ] && export SPARK_GRAFT_BENCH_BASE="$BASE"
exec java $AO -Xmx${SPARK_DRIVER_MEM:-64g} -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.Bench
