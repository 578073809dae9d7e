#!/usr/bin/env bash
# Round-5 lane Z: DeepMusic xing parity, our side on the TPU (reference
# stays on CPU). Runs immediately after lane X landed MF-xing and was
# handed off at its DeepMusic entry.
set -uo pipefail
cd "$(dirname "$0")/.."
export OMP_NUM_THREADS=2
LOG=tools/regen_r5_laneZ.log
touch "$LOG"
source tools/regen_r4_lib.sh
lane_register_pgid

run_to 9000 --model DeepMusic --scale xing --epochs 4 --shared_backbone --eval_every 2

echo "== lane Z complete ==" | tee -a "$LOG"
