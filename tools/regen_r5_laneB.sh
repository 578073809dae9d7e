#!/usr/bin/env bash
# Round-5 lane B (chained behind round-4 lane F): second half of the
# task-5 user-cold ml upgrades. GNN models last (likely the slowest
# reference side); every entry time-bounded.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= OMP_NUM_THREADS=2
LOG=tools/regen_r5_laneB.log
touch "$LOG"
source tools/regen_r4_lib.sh
lane_register_pgid

run_to 5400 --model VBPR --cold_object user --scale ml --epochs 12 --shared_backbone --eval_every 2
run_to 5400 --model AMR --cold_object user --scale ml --epochs 12 --shared_backbone --eval_every 2
run_to 7200 --model AGNN --cold_object user --scale ml --epochs 12 --shared_backbone --eval_every 2
run_to 7200 --model FSGNN --cold_object user --scale ml --epochs 12 --shared_backbone --eval_every 2

echo "== lane B complete ==" | tee -a "$LOG"
