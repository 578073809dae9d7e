#!/usr/bin/env bash
# Round-5 lane Y: CCFCRec item mlfull retry. The first attempt timed out
# at 3h with the reference done and OUR side at round 1/5 -- because lanes
# force JAX_PLATFORMS=cpu and three lanes shared 4 cores. This lane keeps
# the reference on CPU but runs our side on the (idle) TPU: accuracy
# parity is hardware-independent and the artifact's efficiency.env
# records ours_platform=tpu.
set -uo pipefail
cd "$(dirname "$0")/.."
export OMP_NUM_THREADS=2
LOG=tools/regen_r5_laneY.log
touch "$LOG"
source tools/regen_r4_lib.sh
lane_register_pgid

run_to 10200 --model CCFCRec --scale mlfull --epochs 5 --shared_backbone --eval_every 2

run_to 7200 --model MF --scale xing --epochs 4 --eval_every 2
run_to 7200 --model DeepMusic --scale xing --epochs 4 --shared_backbone --eval_every 2

echo "== lane Y complete ==" | tee -a "$LOG"
