#!/bin/bash
# Round-5 chain, part 3 — replaces r5_chain2.sh's tail. Differences:
#   * f06's wt=0 step-2 timed out at iter ~1000/1990 before any eval;
#     phase 1 re-runs the SAME workdir so steps 0-1 skip-if-final and
#     step 2 mid-step-resumes from snapshot-step2-1000 (core/checkpoint
#     latest_intermediate_snapshot) — without this the 0.6 curve point
#     has no wt=0 step-2 comparator and the gm3 arm is uninterpretable.
#   * warmstarted arms pass --eval-steps 2 (steps 0-1 were already
#     evaluated in the source workdir; saves ~20 min TPU each).
#   * the cutoff is DYNAMIC: read from /tmp/r5/cutoff (epoch seconds)
#     before each phase, so the operator can extend it if the round
#     outlives the conservative 11:05 estimate.
# Usage: bash scripts/r5_chain3.sh <pid-to-wait-for>
set -u
mkdir -p /tmp/r5
cd "$(dirname "$0")/.."

[ -f /tmp/r5/cutoff ] || date -d "11:05" +%s > /tmp/r5/cutoff

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "[r5c] waiting on pid $WAIT_PID (f04_gm3)" | tee -a /tmp/r5/chain.log
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[r5c] $(date +%H:%M:%S) f04_gm3 done: $(tail -1 /tmp/r5/f04_gm3.out)" \
    | tee -a /tmp/r5/chain.log
fi

run() {  # run NAME MAXSEC CMD... — deadline-aware, never abort the chain
  name=$1; maxsec=$2; shift 2
  now=$(date +%s); cutoff=$(cat /tmp/r5/cutoff)
  if [ "$now" -gt "$cutoff" ]; then
    echo "[r5c] $(date +%H:%M:%S) SKIP $name (past cutoff)" \
      | tee -a /tmp/r5/chain.log
    return
  fi
  room=$((cutoff + 600 - now))
  [ "$maxsec" -gt "$room" ] && maxsec=$room
  echo "[r5c] $(date +%H:%M:%S) start $name (cap ${maxsec}s)" \
    | tee -a /tmp/r5/chain.log
  ( timeout -k 60 "$maxsec" "$@" > "/tmp/r5/$name.out" 2>&1
    echo "EXIT=$?" >> "/tmp/r5/$name.out" )
  echo "[r5c] $(date +%H:%M:%S) done $name: $(tail -1 /tmp/r5/$name.out)" \
    | tee -a /tmp/r5/chain.log
}

# 1. complete the 0.6 wt=0 chain: steps 0-1 skip, step 2 resumes @1000
run f06_resume 5400 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f06 --fraction 0.6

# 2. gm3 arm at 0.6 (step-2 only retrain + eval)
run f06_gm3 3600 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f06_gm3 --fraction 0.6 --gm3 3 \
    --warmstart-from /tmp/dgp_sparse_f06 --eval-steps 2

# 3-4. train-for-scale step-0 on the SAME 11/44 split as the baseline
#      resolution matrix (EVAL.md quant_scale 2026-08-19 18:29), then
#      the scale/mode accuracy matrix on the scale-trained snapshot
run scale_train 7200 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_scale02 --fraction 0.2 --skip-dgp \
    --scale_jitter 0.5 1.25
run scale_eval 4500 python scripts/quant_eval.py \
    --workdir /tmp/dgp_scale02 --snapshots snapshot-step0-final--0 \
    --scales 1.0 0.75 0.5 \
    --note "scale_jitter 0.5-1.25 trained step-0, same 11/44 split as the 2026-08-19 18:29 baseline matrix"

# 5-6. under-trained step-0 arm at 0.4 + gm2 on the unsaturated model
run f04u 7200 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f04u --fraction 0.4 --iters 5000 3000 2000
run f04u_gm2 3600 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f04u_gm2 --fraction 0.4 \
    --iters 5000 3000 2000 --gm2 2 --warmstart-from /tmp/dgp_sparse_f04u \
    --eval-steps 2

echo "[r5c] chain3 done at $(date)" | tee -a /tmp/r5/chain.log
