#!/usr/bin/env bash
# Round-4 parity lane B (cheaper entries + user-cold + M2VAE/xing tail).
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= OMP_NUM_THREADS=2
LOG=tools/regen_r4_laneB.log
touch "$LOG"
source tools/regen_r4_lib.sh

run --model MF         --scale mlfull --epochs 15
run --model LightGCN   --scale mlfull --epochs 6
run --model DropoutNet --scale mlfull --epochs 10 --shared_backbone --eval_every 2
run --model DeepMusic  --cold_object user --scale mlfull --epochs 8 --shared_backbone --eval_every 2
run --model DropoutNet --cold_object user --scale mlfull --epochs 8 --shared_backbone --eval_every 2
run --model M2VAE --scale ml --epochs 4 --eval_every 2
run --model DeepMusic --scale xing --epochs 4 --shared_backbone --eval_every 2

echo "== lane B complete ==" | tee -a "$LOG"
