#!/usr/bin/env bash
# Round-5 lane X: the two XING parity artifacts (VERDICT task 1 tail).
# Their first attempt on lane F crashed in OUR eval sweep: the
# overfetch-reject cube is (B, k+R, R) and XING power users make R huge
# (264 GB allocation). masked_topk now switches to the scattered mask
# plane in that regime (runtime/eval.py); this lane reruns both entries.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= OMP_NUM_THREADS=2
LOG=tools/regen_r5_laneX.log
touch "$LOG"
source tools/regen_r4_lib.sh
lane_register_pgid

run_to 7200 --model MF --scale xing --epochs 4 --eval_every 2
run_to 7200 --model DeepMusic --scale xing --epochs 4 --shared_backbone --eval_every 2

echo "== lane X complete ==" | tee -a "$LOG"
