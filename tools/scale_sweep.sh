#!/usr/bin/env bash
# Book-crossing-scale validation sweep: every model, 1 epoch + 3-way eval
# on the real chip (tools/scale_run.py). Continues past failures; writes
# per-model wall/epoch timing to tools/scale_sweep.log.
#
# VBPR runs before AMR (AMR consumes VBPR's 5-tensor bus artifact);
# everything else uses the MF backbone scale_run provides automatically.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=tools/scale_sweep.log
: > "$LOG"

run_one() { # run_one <model> [extra args...]
  local m=$1; shift
  echo "=== $m start $(date +%H:%M:%S)" | tee -a "$LOG"
  if timeout 2400 python tools/scale_run.py --model "$m" --epochs 1 "$@" \
      > "/tmp/scale_$m.out" 2>&1; then
    grep -E "Time:|scale_run" "/tmp/scale_$m.out" | tail -3 | tee -a "$LOG"
  else
    echo "$m FAILED rc=$? (tail below)" | tee -a "$LOG"
    tail -5 "/tmp/scale_$m.out" | tee -a "$LOG"
  fi
}

# warm backbones (LightGCN/MF already validated; NCL heaviest: k-means)
for m in NGCF SimGCL XSimGCL NCL; do run_one "$m"; done
# cold-start generators on the MF bus
for m in KNN DeepMusic DUIF DropoutNet MTPR LARA Heater MetaEmbedding \
         CLCRec GAR GoRec CCFCRec ALDI AGNN FSGNN M2VAE; do
  run_one "$m"
done
# VBPR (writes its 5-tensor artifact) then AMR on top of it
run_one VBPR
run_one AMR --backbone VBPR
echo "=== sweep done $(date +%H:%M:%S)" | tee -a "$LOG"
