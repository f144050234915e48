#!/bin/bash
# One-shot measurement session for when the TPU relay is reachable:
# waits for backend init to succeed, then runs every pending hardware
# measurement in sequence, logging to /tmp/tpu_session/.
# Usage: bash scripts/tpu_session.sh [skip-wait]
set -u
mkdir -p /tmp/tpu_session
cd "$(dirname "$0")/.."

if [ "${1:-}" != "skip-wait" ]; then
  echo "[session] waiting for TPU backend..."
  until timeout -k 5 75 python -c "import jax; jax.devices()" \
      > /dev/null 2>&1; do
    date >> /tmp/tpu_session/wait.log
    sleep 120
  done
fi
echo "[session] TPU up at $(date)"

run() {  # run NAME CMD... — log, never abort the session on one failure
  name=$1; shift
  echo "[session] $name: $*"
  ( "$@" > "/tmp/tpu_session/$name.out" 2> "/tmp/tpu_session/$name.err"
    echo "EXIT=$?" >> "/tmp/tpu_session/$name.out" )
}

# 1. train-step decomposition (PERF.md training roofline)
run train_profile timeout 3600 python scripts/train_profile.py
# 2. scan-superstep end-to-end timing (needs the Reaching project from the
#    tuning sweep at /tmp/dgp_eval5; skipped cleanly if absent)
if [ -d /tmp/dgp_eval5/Reaching-Mackenzie-2018-08-30 ]; then
  run scan_timing timeout 3600 python scripts/scan_timing.py
  # 3. int8 accuracy on the real fixture (bf16 vs int8, dlc+dgp decodes)
  run quant_eval timeout 3600 python scripts/quant_eval.py \
      --snapshots snapshot-step0-final--0
fi
# 4. headline bench with the int8 sub-measurements
run bench timeout 3600 python bench.py
# 5. train-step bench mode
run bench_train env BENCH_MODE=train timeout 1800 python bench.py

echo "[session] done at $(date)"; ls -la /tmp/tpu_session/
