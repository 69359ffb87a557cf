#!/bin/bash
# Pending-TPU measurement queue. Run from the repo root the moment
# `timeout 60 python -c "import jax; print(jax.devices())"` shows the axon
# device. ONE TPU process at a time — this script serializes everything.
#
#   bash scripts/tpu_pending.sh 2>&1 | tee /tmp/tpu_pending.log
#
# Round-4 status: EMPTY — every queued measurement ran (see BENCH_NOTES.md
# "Round 4" sections): r4exact/r4luma/r4tab/r4b/r4c (hist-cells, tables
# kernel, int8 one-hots, masked-lane decimation, barriers — defaults all
# flipped per the interleaved medians), r4remat (b16 fits with remat but
# loses to b8 std — remat stays a memory lever), labsub revalidation at
# 3-step cbrt, netroof (whole-graph roofline), the recorded convergence run,
# three full bench.py sets, and the 640px b12/b16 train batch-scaling probe.
#
# Template for queueing new measurements:
#   run python scripts/perf_lab.py <experiment>

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  timeout 3600 env "$@"
  echo "=== exit $? ==="
}

# (queue empty)
