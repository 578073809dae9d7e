#!/usr/bin/env bash
# Round-4 restart lane F (pair of lane E): M2VAE ml upgrade (VERDICT task
# 5), DropoutNet user-cold mlfull (task 1), then the XING parity
# spot-check for MF (task 2; DeepMusic xing follows if time remains).
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= OMP_NUM_THREADS=2
LOG=tools/regen_r4_laneF.log
touch "$LOG"
source tools/regen_r4_lib.sh
lane_register_pgid

run --model M2VAE --scale ml --epochs 4 --eval_every 2
run --model DropoutNet --cold_object user --scale mlfull --epochs 8 --shared_backbone --eval_every 2
run --model MF --scale xing --epochs 4 --eval_every 2
run --model DeepMusic --scale xing --epochs 4 --shared_backbone --eval_every 2

echo "== lane F complete ==" | tee -a "$LOG"
