#!/bin/bash
# Pending-TPU measurement queue (round 3; tunnel relay died before these ran).
# Run from the repo root the moment `timeout 60 python -c "import jax;
# print(jax.devices())"` shows the axon device. ONE TPU process at a time —
# this script serializes everything. Expect the first compiles to take
# minutes through the tunnel (persistent cache warms them).
#
#   bash scripts/tpu_pending.sh 2>&1 | tee /tmp/tpu_pending.log
#
# Queue, in value order:
#   1. perf_lab lumafast  — asserts clahe_luma kernel parity ON-CHIP vs the
#      XLA oracle (also re-validates the round-3 precision=HIGHEST fix to the
#      neighbour-LUT einsum: border columns were silently corrupted at TPU
#      default matmul precision), then times luma vs Lab pipelines.
#      Predicted 4,400-5,300 fps (BENCH_NOTES SOL analysis).
#   2. bench.py           — the full official metric set (now also measures
#      clahe_luma, bf16 train, packed train A/B).
#   3. perf_lab gather    — on-chip exact-Lab parity re-check post-fix.
#   4. perf_lab trainsplit — optional: re-attribute the train step with the
#      packed-train path now available.

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  timeout 2400 "$@"
  echo "=== exit $? ==="
}

run python scripts/perf_lab.py lumafast
run python bench.py
run python scripts/perf_lab.py gather
