#!/usr/bin/env bash
# Round-4 follow-on lane C (launched when lane A drains): extra mlfull
# item-cold upgrades beyond the VERDICT representative set, cheapest
# first with --eval_every 2 to bound per-entry cost.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= OMP_NUM_THREADS=2
LOG=tools/regen_r4_laneC.log
touch "$LOG"
source tools/regen_r4_lib.sh

run --model KNN           --scale mlfull --epochs 12 --eval_every 2
run --model DUIF          --scale mlfull --epochs 10 --eval_every 2
run --model VBPR          --scale mlfull --epochs 10 --eval_every 2
run --model MetaEmbedding --scale mlfull --epochs 10 --shared_backbone --eval_every 2
run --model AGNN          --scale mlfull --epochs 8 --shared_backbone --eval_every 2

echo "== lane C complete ==" | tee -a "$LOG"
