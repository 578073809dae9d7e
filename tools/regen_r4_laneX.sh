#!/usr/bin/env bash
# Round-4 XING parity lane (VERDICT task 2): runs the xing spot-checks
# immediately instead of waiting behind the mlfull queues — the
# reference side at this shape is the round's longest pole (MF 313 s
# wall for 1 epoch+eval, measured by tools/measure_ccfcrec_xing.py).
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= OMP_NUM_THREADS=2
LOG=tools/regen_r4_laneX.log
touch "$LOG"
source tools/regen_r4_lib.sh

run --model MF        --scale xing --epochs 4 --eval_every 2
run --model DeepMusic --scale xing --epochs 4 --shared_backbone --eval_every 2

echo "== lane X complete ==" | tee -a "$LOG"
