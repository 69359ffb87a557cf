#!/bin/bash
# Pending-TPU measurement queue. Run from the repo root the moment
# `timeout 60 python -c "import jax; print(jax.devices())"` shows the axon
# device. ONE TPU process at a time — this script serializes everything.
#
#   bash scripts/tpu_pending.sh 2>&1 | tee /tmp/tpu_pending.log
#
# Round-3 status: EMPTY — every queued measurement ran (see BENCH_NOTES.md
# "Round 3 (late)" sections): lumafast/lumastages/lumafuse, gather parity
# re-check post precision fix (unchanged), bench.py full set (recorded),
# netstages+netcfg at b8 (defaults all confirmed), bigbatch (b16=36 fps
# saturation, b24/32 OOM), packed-train A/B (default flipped ON).
#
# Template for queueing new measurements:

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  echo "=== $* ==="
  timeout 2400 env "$@"
  echo "=== exit $? ==="
}

# run python scripts/perf_lab.py <experiment>
run python bench.py
