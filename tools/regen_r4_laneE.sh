#!/usr/bin/env bash
# Round-4 restart lane E (the machine restart killed lanes A-D/X mid-queue;
# artifact state on disk is the resume point — done_already skips finished
# entries). Cheapest-first to maximize completed artifacts before the round
# closes: CGRC ml upgrade (VERDICT task 5), then the user-cold mlfull
# entries (task 1), then CCFCRec mlfull.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= OMP_NUM_THREADS=2
LOG=tools/regen_r4_laneE.log
touch "$LOG"
# Register this lane's process group so bench.py can SIGSTOP it (exact
# pgid, never a pattern) while it measures the torch CPU baseline.
echo "$$" >> tools/.parity_lane_pgids
source tools/regen_r4_lib.sh

run --model CGRC --scale ml --epochs 4 --eval_every 2
run --model DeepMusic --cold_object user --scale mlfull --epochs 8 --shared_backbone --eval_every 2
run --model CCFCRec --scale mlfull --epochs 5 --shared_backbone --eval_every 2

echo "== lane E complete ==" | tee -a "$LOG"
