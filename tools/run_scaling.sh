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
ROWS=${SPARK_GRAFT_BENCH_ROWS:-32000000}
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
  # heap scales with cores: a 4N-executor cluster has 4x the total memory
  # of an N-executor cluster (per-executor memory is constant), so the
  # single-JVM proxy must scale -Xmx the same way or the 4N run is
  # GC-starved relative to its cluster equivalent.
  SPARK_GRAFT_BENCH_ROWS=$ROWS SPARK_GRAFT_CORES=$cores \
    java $OPENS "-Xmx${cores}g" "-XX:ActiveProcessorCount=$cores" \
    -Dspark.ui.enabled=false -cp "$CP" graft.ScalingBench 2>"/tmp/scaling_run_${cores}.err" \
    | grep -o '{"metric":"validate_rows_per_sec".*}' | tail -1
}

# generate input once (at full parallelism) so both runs read identical data
SPARK_GRAFT_GENONLY=1 SPARK_GRAFT_BENCH_ROWS=$ROWS SPARK_GRAFT_CORES=$N4 \
  java $OPENS -Xmx8g -Dspark.ui.enabled=false -cp "$CP" \
  graft.ScalingBench >/dev/null 2>&1 || true

# Interleaved A/B sampling: this sandbox VM suffers minutes-scale
# noisy-neighbor swings, so alternate core counts. Throughput per arm is
# best-of (interference is one-sided — it can only slow a run down), but
# EFFICIENCY is computed per back-to-back PAIR and summarized by the
# median: a ratio of bests drawn from different noise windows mixes a
# lucky denominator with an unlucky numerator (or vice versa) and is
# biased either way.
REPS=${SPARK_GRAFT_SCALING_REPS:-3}
best1=0; best2=0
PAIRS=""
for i in $(seq "$REPS"); do
  J1=$(run "$N" || true);  R1=$(echo "$J1" | sed 's/.*"rows_per_sec"://; s/}//')
  J2=$(run "$N4" || true); R2=$(echo "$J2" | sed 's/.*"rows_per_sec"://; s/}//')
  echo "sample $i: N=${R1:-FAIL} 4N=${R2:-FAIL}" >&2
  if [ -n "$R1" ] && [ "$R1" -gt "$best1" ]; then best1=$R1; fi
  if [ -n "$R2" ] && [ "$R2" -gt "$best2" ]; then best2=$R2; fi
  if [ -n "$R1" ] && [ -n "$R2" ]; then PAIRS="$PAIRS $R1:$R2"; fi
done
EFF=$(python3 - "$PAIRS" <<'PYEOF'
import sys
pairs = [tuple(map(int, p.split(":"))) for p in sys.argv[1].split()]
effs = sorted(r2 / (4.0 * r1) for r1, r2 in pairs)
mid = len(effs) // 2
med = effs[mid] if len(effs) % 2 else (effs[mid - 1] + effs[mid]) / 2
print(f"{med:.3f} [{','.join(f'{e:.3f}' for e in effs)}]")
PYEOF
)
MED=${EFF%% *}
ALL=${EFF#* }
echo "{\"metric\":\"validate_rows_per_sec\",\"cores\":$N,\"rows_per_sec\":$best1}"
echo "{\"metric\":\"validate_rows_per_sec\",\"cores\":$N4,\"rows_per_sec\":$best2}"
echo "{\"metric\":\"scaling_efficiency\",\"value\":$MED,\"pairwise\":$ALL,\"n_cores\":$N,\"n4_cores\":$N4,\"rows\":$ROWS,\"rows_per_sec_n\":$best1,\"rows_per_sec_4n\":$best2}"
