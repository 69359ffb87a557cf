#!/bin/bash
# Pending-TPU measurement queue. Run from the repo root the moment
# `timeout 60 python -c "import jax; print(jax.devices())"` shows the axon
# device. ONE TPU process at a time — this script serializes everything.
#
#   bash scripts/tpu_pending.sh 2>&1 | tee /tmp/tpu_pending.log
#
# Round-5 queue (in priority order; delete lines as they complete):
#   [done] perf_lab trainroof — backward roofline (BENCH_NOTES r5 table)
#   [done] perf_lab r5loss/r5smooth — smoothness-loss fix, +9.5% train
#   [done] perf_lab r5exact — band sweep + k_big calibration
#   [done] bench.py x3 with logs -> artifacts/bench_r05/run{1,2,3}.log
#   [done] classical-only probe + group-composition A/B
#          (artifacts/bench_r05/{classical_probe_0821,groupcomp_ab}.log)
# Queue empty. The loop below is the template for new measurements: ONE
# process at a time, generous timeouts, tee to a committed log.

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

mkdir -p artifacts/bench_r05
for i in 1 2 3; do
  echo "=== bench run $i ==="
  timeout 5400 env BENCH_BUDGET_S=4800 python bench.py 2>&1 \
    | tee "artifacts/bench_r05/run$i.log"
done
