#!/bin/bash
# Two-cluster-size scaling evidence: same job, same input, local[N] vs
# local[4N], each in its OWN JVM with ActiveProcessorCount pinned so the
# small-N run behaves like an N-core node. Prints both throughputs and
# efficiency = rps(4N) / (4 * rps(N)).
#
# Requires compiled classes (sbt -batch compile) — invokes java directly to
# avoid per-run sbt startup and lock contention.
set -e
cd "$(dirname "$0")/.."
N=${1:-8}
N4=$((N * 4))
ROWS=${SPARK_GRAFT_BENCH_ROWS:-8000000}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

run() {
  local cores=$1
  SPARK_GRAFT_BENCH_ROWS=$ROWS SPARK_GRAFT_CORES=$cores \
    java $OPENS -Xmx8g "-XX:ActiveProcessorCount=$cores" \
    -Dspark.ui.enabled=false -cp "$CP" graft.ScalingBench 2>/dev/null \
    | grep -o '{"metric":"validate_rows_per_sec".*}' | tail -1
}

# generate input once (at full parallelism) so both runs read identical data
SPARK_GRAFT_BENCH_ROWS=$ROWS SPARK_GRAFT_CORES=$N4 \
  java $OPENS -Xmx8g -Dspark.ui.enabled=false -cp "$CP" \
  graft.ScalingBench >/dev/null 2>&1 || true

J1=$(run "$N")
J2=$(run "$N4")
R1=$(echo "$J1" | sed 's/.*"rows_per_sec"://; s/}//')
R2=$(echo "$J2" | sed 's/.*"rows_per_sec"://; s/}//')
EFF=$(python3 -c "print(f'{$R2 / (4.0 * $R1):.3f}')")
echo "$J1"
echo "$J2"
echo "{\"metric\":\"scaling_efficiency\",\"value\":$EFF,\"n_cores\":$N,\"n4_cores\":$N4,\"rows\":$ROWS,\"rows_per_sec_n\":$R1,\"rows_per_sec_4n\":$R2}"
