#!/usr/bin/env bash
# Round-5 lane A (replaces round-4 lane E, whose CGRC-ml head entry was
# measured infeasible at runs=5 on this host -- tools/CGRC_ML_COST.json):
# the remaining VERDICT task-1 queue, then the first half of the task-5
# user-cold ml upgrades, cheapest-first, every entry time-bounded.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= OMP_NUM_THREADS=2
LOG=tools/regen_r5_laneA.log
touch "$LOG"
source tools/regen_r4_lib.sh
lane_register_pgid

run_to 10800 --model DeepMusic --cold_object user --scale mlfull --epochs 8 --shared_backbone --eval_every 2
run_to 10800 --model CCFCRec --scale mlfull --epochs 5 --shared_backbone --eval_every 2
run_to 5400 --model Heater --cold_object user --scale ml --epochs 12 --shared_backbone --eval_every 2
run_to 5400 --model GoRec --cold_object user --scale ml --epochs 12 --shared_backbone --eval_every 2
run_to 5400 --model LARA --cold_object user --scale ml --epochs 12 --shared_backbone --eval_every 2
run_to 5400 --model MTPR --cold_object user --scale ml --epochs 12 --shared_backbone --eval_every 2

echo "== lane A complete ==" | tee -a "$LOG"
