#!/usr/bin/env bash
# Round-4 follow-on lane D (launched when lane B drains): more mlfull
# item-cold upgrades, cheapest first.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= OMP_NUM_THREADS=2
LOG=tools/regen_r4_laneD.log
touch "$LOG"
source tools/regen_r4_lib.sh

run --model LARA  --scale mlfull --epochs 10 --eval_every 2
run --model ALDI  --scale mlfull --epochs 8  --eval_every 2
run --model FSGNN --scale mlfull --epochs 8  --eval_every 2
run --model MTPR  --scale mlfull --epochs 10 --eval_every 2

echo "== lane D complete ==" | tee -a "$LOG"
