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
# one floor, both guards: the in-run guard (ClusterScalingBench) reads
# SPARK_GRAFT_MIN_FREE_GB — without this export an MIN_FREE_GB override
# would lower only the shell guard and the driver would still exit(2) at
# its own 40 GiB default
export SPARK_GRAFT_MIN_FREE_GB="${MIN_FREE_GB:-40}"
J=${JAR:-/tmp/graft.jar}
N=${1:-1000000}
P=${2:-2}
OUT=${3:-bench/cluster_r5b}
SCRATCH=${SPARK_LOCAL_DIR:-/tmp/graft_scratch}
mkdir -p "$OUT" "$SCRATCH"

run() { # run <tag> <master>
  local tag=$1 master=$2
  # preserve the PREVIOUS leg's executor stderr before wiping: when a leg
  # dies, the executor-side evidence is in work/app-*/<id>/stderr and a
  # blind rm here erased the only diagnostics of the r5 2M failure
  mkdir -p /tmp/spark_work_prev && rm -rf /tmp/spark_work_prev/*
  find /opt/spark/work -name 'stderr' -size +0 2>/dev/null | head -20 | while read -r f; do
    cp "$f" "/tmp/spark_work_prev/$(echo "$f" | tr / _)" 2>/dev/null
  done
  rm -rf /opt/spark/work/app-* "${SCRATCH:?}"/*
  local free_gb
  free_gb=$(df -BG --output=avail "$SCRATCH" | tail -1 | tr -dc 0-9)
  echo "[pair] $tag master=$master free=${free_gb}G scratch=$SCRATCH"
  if [ "$free_gb" -lt "${MIN_FREE_GB:-40}" ]; then
    echo "[pair] ABORT: ${free_gb}G free < ${MIN_FREE_GB:-40}G floor — clean scratch first" >&2
    exit 2
  fi
  # Disk-footprint confs (r5: the 2M N leg wrote >75 GiB of lz4 shuffle +
  # uncompressed spilled cache blocks into an 80 GiB budget and had to be
  # killed by the free-space watchdog):
  #   * zstd shuffle/spill compression — ~1.5x smaller than lz4 on this
  #     text-heavy shuffle data, identical on both legs so the pair stays
  #     internally comparable (and is the config a real cluster runs).
  #   * spark.rdd.compress — cached turn blocks spilled to disk are
  #     compressed (default false).
  #   * periodic driver GC every 5 min (default 30) — ContextCleaner can
  #     only delete retired shuffle files after a driver GC collects their
  #     references; with an 8g driver heap that never fills, retired
  #     stages' files (47 GiB at the 2M run's first plateau) linger to
  #     overlap the next stage's writes.
  /opt/spark/bin/spark-submit --master "$master" --driver-memory 8g \
    --conf spark.executor.memory=7g \
    --conf spark.local.dir="$SCRATCH" \
    --conf spark.io.compression.codec=zstd \
    --conf spark.rdd.compress=true \
    --conf spark.cleaner.periodicGC.interval=5min \
    --class graft.ClusterScalingBench "$J" "$N" \
    >"/tmp/cluster_${tag}.log" 2>&1
  grep -h '"bench"' "/tmp/cluster_${tag}.log" | tail -1 >"$OUT/${tag}.json"
  # a dead leg (disk guard, OOM, executor crash) produces no bench line:
  # fail LOUDLY instead of committing a 0-byte JSON and running the next
  # leg as if nothing happened
  if [ ! -s "$OUT/${tag}.json" ]; then
    rm -f "$OUT/${tag}.json"
    echo "[pair] FAILED leg $tag — no bench JSON in /tmp/cluster_${tag}.log (tail below)" >&2
    tail -5 "/tmp/cluster_${tag}.log" >&2
    exit 3
  fi
  grep -h 'disk guard' "/tmp/cluster_${tag}.log" | tail -1
  cat "$OUT/${tag}.json"
}

for i in $(seq 1 "$P"); do
  run "N_${N}_run${i}" 'local-cluster[2,2,8192]'
  run "4N_${N}_run${i}" 'local-cluster[8,2,8192]'
done
echo "[pair] all done -> $OUT"
