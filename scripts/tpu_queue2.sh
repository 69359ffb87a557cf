#!/bin/bash
# Round-3 continuation: second TPU measurement batch (run AFTER
# scripts/tpu_pending.sh completes — one tunnel process at a time).
#
#   nohup setsid bash scripts/tpu_queue2.sh > /tmp/tpu_queue2.log 2>&1 &
#
# Queue:
#   1. netstages @ b8  — fresh stage attribution at the production batch
#      (previous bisection was b2; the batch-8 graph pipelines differently).
#   2. netcfg @ b8     — re-sweep kernel choices at b8 (aspp_dots lost at b2
#      to conv-pipelining breaks; batch changes such verdicts).
#   3. bigbatch 16,24,32 — where does packed fps/chip saturate?
#   4. trainpacked     — packed-train full-graph A/B (gates the default).

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  timeout 2400 env "$@"
  echo "=== exit $? ==="
}

run python scripts/perf_lab.py lumastages
run RETINEX_PERF_BATCH=8 python scripts/perf_lab.py netstages
run RETINEX_PERF_BATCH=8 python scripts/perf_lab.py netcfg
run RETINEX_PERF_BATCHES=16,24,32 python scripts/perf_lab.py bigbatch
run python scripts/perf_lab.py trainpacked
