#!/usr/bin/env bash
# Round-4 parity lane A (heavier entries). Runs alongside lane B on the
# 4-core host; OMP_NUM_THREADS=2 keeps the two torch reference processes
# from oversubscribing each other. CPU-forced so the TPU stays free.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= OMP_NUM_THREADS=2
LOG=tools/regen_r4_laneA.log
touch "$LOG"
source tools/regen_r4_lib.sh

run --model GAR        --scale mlfull --epochs 10 --shared_backbone
run --model Heater     --scale mlfull --epochs 10 --shared_backbone --eval_every 2
run --model GoRec      --scale mlfull --epochs 8  --shared_backbone --eval_every 2
run --model CCFCRec    --scale mlfull --epochs 5  --shared_backbone --eval_every 2
run --model CGRC  --scale ml --epochs 4 --eval_every 2
run --model MF        --scale xing --epochs 4 --eval_every 2

echo "== lane A complete ==" | tee -a "$LOG"
