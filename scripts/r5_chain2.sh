#!/bin/bash
# Round-5 chain, part 2 — replaces r5_chain.sh's tail (the orchestrator
# was stopped mid-f06; this script waits for that run to finish, then
# executes the remaining phases with two fixes over the original tail):
#   * the train-for-scale arm (VERDICT r4 #2) runs at TrainingFraction
#     0.2 — the SAME 11/44 split the baseline resolution matrix
#     (EVAL.md quant_scale, 2026-08-19 18:29) was measured on, so the
#     scale-cost comparison is same-split with n_test=44 (the original
#     tail used 0.95 -> n_test=3);
#   * phases are ordered by evidence value (gm3 curve arms, scale train
#     + eval, then the under-trained/gm2 arms) with a deadline guard so
#     the chip frees before the end-of-round driver bench.
# Usage: bash scripts/r5_chain2.sh <pid-to-wait-for>
set -u
mkdir -p /tmp/r5
cd "$(dirname "$0")/.."

CUTOFF=$(date -d "11:10" +%s)   # start no phase after this (round ends ~11:33)

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "[r5b] waiting on pid $WAIT_PID (f06)" | tee -a /tmp/r5/chain.log
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "[r5b] $(date +%H:%M:%S) f06 done: $(tail -1 /tmp/r5/f06.out)" \
    | tee -a /tmp/r5/chain.log
fi

run() {  # run NAME MAXSEC CMD... — deadline-aware, never abort the chain
  name=$1; maxsec=$2; shift 2
  now=$(date +%s)
  if [ "$now" -gt "$CUTOFF" ]; then
    echo "[r5b] $(date +%H:%M:%S) SKIP $name (past cutoff)" \
      | tee -a /tmp/r5/chain.log
    return
  fi
  # never let a phase run past cutoff+10min
  room=$((CUTOFF + 600 - now))
  [ "$maxsec" -gt "$room" ] && maxsec=$room
  echo "[r5b] $(date +%H:%M:%S) start $name (cap ${maxsec}s)" \
    | tee -a /tmp/r5/chain.log
  ( timeout -k 60 "$maxsec" "$@" > "/tmp/r5/$name.out" 2>&1
    echo "EXIT=$?" >> "/tmp/r5/$name.out" )
  echo "[r5b] $(date +%H:%M:%S) done $name: $(tail -1 /tmp/r5/$name.out)" \
    | tee -a /tmp/r5/chain.log
}

run f04_gm3 3600 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f04_gm3 --fraction 0.4 --gm3 3 \
    --warmstart-from /tmp/dgp_sparse_f04
run f06_gm3 3600 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f06_gm3 --fraction 0.6 --gm3 3 \
    --warmstart-from /tmp/dgp_sparse_f06

run scale_train 7200 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_scale02 --fraction 0.2 --skip-dgp \
    --scale_jitter 0.5 1.25
run scale_eval 4500 python scripts/quant_eval.py \
    --workdir /tmp/dgp_scale02 --snapshots snapshot-step0-final--0 \
    --scales 1.0 0.75 0.5 \
    --note "scale_jitter 0.5-1.25 trained step-0, same 11/44 split as the 2026-08-19 18:29 baseline matrix"

run f04u 7200 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f04u --fraction 0.4 --iters 5000 3000 2000
run f04u_gm2 3600 python scripts/sparse_eval.py \
    --workdir /tmp/dgp_sparse_f04u_gm2 --fraction 0.4 \
    --iters 5000 3000 2000 --gm2 2 --warmstart-from /tmp/dgp_sparse_f04u

echo "[r5b] chain2 done at $(date)" | tee -a /tmp/r5/chain.log
