#!/bin/bash
# N (2 executors x 2 cores) vs 4N (8 executors x 2 cores) scaling pairs via
# spark-submit in local-cluster mode — REAL executor JVMs, the sandbox's
# closest analogue of BASELINE.json's "N and 4N executors" criterion.
#
# The pair scales EXECUTOR COUNT at fixed 2 cores/executor (4 -> 16 task
# threads) so BOTH legs leave host headroom on the shared 32-core box: the
# retired 2x4-vs-8x4 pair ran 32 task threads at 4N and measured 3.1x
# executor-CPU stall inflation + 25% run-to-run CPU disagreement — it
# measured the host, not the engine (BENCH/BASELINE.md round 5).
#
# Round-5 hardening (VERDICT r4 #1/#2):
#   * spark.executor.memory=7g — local-cluster[n,c,MEM] sets only the WORKER
#     budget; without this, executors silently run the 1g default (every
#     r3/r4 cluster sample did, spill-handicapped).
#   * disk guard + scratch cleanup between runs — the r4 2M-conv run filled
#     the root disk with shuffle spill and died; spark.local.dir is pinned
#     to a dedicated scratch dir that is wiped before each run, and a df
#     floor aborts early with a clear message (ClusterScalingBench logs the
#     same guard in-run).
#   * result JSONs land in the repo (bench/) so they survive the sandbox;
#     full logs stay in /tmp (megabytes of executor chatter).
#
# Usage: scripts/cluster_pairs.sh [nConvIds] [pairs] [outDir]
#   JAR=/tmp/graft.jar MIN_FREE_GB=40 to override.
set -u
export SPARK_HOME=/opt/spark
J=${JAR:-/tmp/graft.jar}
N=${1:-1000000}
P=${2:-2}
OUT=${3:-bench/cluster_r5b}
SCRATCH=${SPARK_LOCAL_DIR:-/tmp/graft_scratch}
mkdir -p "$OUT" "$SCRATCH"

run() { # run <tag> <master>
  local tag=$1 master=$2
  rm -rf /opt/spark/work/app-* "${SCRATCH:?}"/*
  local free_gb
  free_gb=$(df -BG --output=avail "$SCRATCH" | tail -1 | tr -dc 0-9)
  echo "[pair] $tag master=$master free=${free_gb}G scratch=$SCRATCH"
  if [ "$free_gb" -lt "${MIN_FREE_GB:-40}" ]; then
    echo "[pair] ABORT: ${free_gb}G free < ${MIN_FREE_GB:-40}G floor — clean scratch first" >&2
    exit 2
  fi
  /opt/spark/bin/spark-submit --master "$master" --driver-memory 8g \
    --conf spark.executor.memory=7g \
    --conf spark.local.dir="$SCRATCH" \
    --class graft.ClusterScalingBench "$J" "$N" \
    >"/tmp/cluster_${tag}.log" 2>&1
  grep -h '"bench"' "/tmp/cluster_${tag}.log" | tail -1 >"$OUT/${tag}.json"
  grep -h 'disk guard' "/tmp/cluster_${tag}.log" | tail -1
  cat "$OUT/${tag}.json"
}

for i in $(seq 1 "$P"); do
  run "N_${N}_run${i}" 'local-cluster[2,2,8192]'
  run "4N_${N}_run${i}" 'local-cluster[8,2,8192]'
done
echo "[pair] all done -> $OUT"
