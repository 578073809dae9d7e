#!/usr/bin/env bash
# XING-shape validation sweep (round-2 VERDICT task 4): the reference's
# heaviest published dataset shape — 106,881 x 20,519, ~3.86M interactions,
# item content dim 2,738 (/root/reference/data/README.md:11). 3.7x the nnz
# of book-crossing (stresses sampler, ELL build, graph SpMM) and 6.6x the
# content width (stresses every content-MLP first layer and the
# CCFCRec/M2VAE attribute attention). Representative model set per
# VERDICT: MF, LightGCN, CCFCRec, DeepMusic, FSGNN, USIM.
# 1 epoch + per-epoch validation + 3-way test each, on the real chip.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=tools/xing_sweep.log
: > "$LOG"

run_one() { # run_one <model> [extra args...]
  local m=$1; shift
  echo "=== $m start $(date +%H:%M:%S)" | tee -a "$LOG"
  if timeout 4800 python tools/scale_run.py --shape xing --model "$m" \
      --epochs 1 "$@" > "/tmp/xing_$m.out" 2>&1; then
    grep -E "Time:|scale_run" "/tmp/xing_$m.out" | tail -3 | tee -a "$LOG"
  else
    echo "$m FAILED rc=$? (tail below)" | tee -a "$LOG"
    tail -8 "/tmp/xing_$m.out" | tee -a "$LOG"
  fi
}

run_one MF --epochs 2
for m in LightGCN DeepMusic CCFCRec FSGNN USIM; do run_one "$m"; done
echo "=== xing sweep done $(date +%H:%M:%S)" | tee -a "$LOG"
