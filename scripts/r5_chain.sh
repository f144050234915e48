#!/bin/bash
# Round-5 serial TPU measurement chain (one chip — never parallelize):
#   0. resint8 full-frame attribution profile        (VERDICT r4 #3)
#   1-2. sparse transition curve, TrainingFraction 0.4 / 0.6 full chains
#   3-4. gm3=3 step-2 arms warmstarted from those chains  (VERDICT #1)
#   5. under-trained step-0 arm at 0.4                    (VERDICT #1)
#   6. gm2=2 step-2 arm on the unsaturated model          (VERDICT #7)
#   7. train-for-scale step-0 (scale_jitter 0.5-1.25)     (VERDICT #2)
#   8. scale/mode accuracy matrix on the scale-trained snapshot
# Logs: /tmp/r5/<phase>.out; progress: /tmp/r5/chain.log.
# Usage: bash scripts/r5_chain.sh [skip-wait]
set -u
mkdir -p /tmp/r5
cd "$(dirname "$0")/.."

if [ "${1:-}" != "skip-wait" ]; then
  echo "[r5] waiting for TPU backend..." | tee -a /tmp/r5/chain.log
  until timeout -k 5 75 python -c "import jax; jax.devices()" \
      > /dev/null 2>&1; do
    date >> /tmp/r5/wait.log
    sleep 120
  done
fi
echo "[r5] TPU up at $(date)" | tee -a /tmp/r5/chain.log

run() {  # run NAME CMD... — log, never abort the chain on one failure
  name=$1; shift
  echo "[r5] $(date +%H:%M:%S) start $name" | tee -a /tmp/r5/chain.log
  ( "$@" > "/tmp/r5/$name.out" 2>&1
    echo "EXIT=$?" >> "/tmp/r5/$name.out" )
  echo "[r5] $(date +%H:%M:%S) done $name: $(tail -1 /tmp/r5/$name.out)" \
    | tee -a /tmp/r5/chain.log
}

run profile timeout -k 60 2400 python scripts/resint8_profile.py

run f04 timeout -k 60 9000 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f04 --fraction 0.4
run f06 timeout -k 60 9000 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f06 --fraction 0.6

run f04_gm3 timeout -k 60 3600 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f04_gm3 --fraction 0.4 --gm3 3 \
    --warmstart-from /tmp/dgp_sparse_f04
run f06_gm3 timeout -k 60 3600 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f06_gm3 --fraction 0.6 --gm3 3 \
    --warmstart-from /tmp/dgp_sparse_f06

run f04u timeout -k 60 7200 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f04u --fraction 0.4 --iters 5000 3000 2000
run f04u_gm2 timeout -k 60 3600 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f04u_gm2 --fraction 0.4 \
    --iters 5000 3000 2000 --gm2 2 --warmstart-from /tmp/dgp_sparse_f04u

run scale_train timeout -k 60 9000 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_scale --fraction 0.95 --skip-dgp \
    --scale_jitter 0.5 1.25
run scale_eval timeout -k 60 5400 python scripts/quant_eval.py \
    --workdir /tmp/dgp_scale --snapshots snapshot-step0-final--0 \
    --scales 1.0 0.75 0.5

echo "[r5] chain done at $(date)" | tee -a /tmp/r5/chain.log
