#!/usr/bin/env bash
# Round-4 parity queue (VERDICT r3 tasks 1, 2, 5): faithful-statistics
# tiers. Runs the v3 harness at
#   - mlfull (REAL MovieLens-1M statistics: 6,040 x 3,706, 1,000,209
#     interactions, content 206 item / 3469 user) for a representative
#     model set spanning every family, runs=5;
#   - ml for CGRC and M2VAE (upgrading their medium artifacts);
#   - xing (106,881 x 20,519, 3.86M nnz, content 2,738) spot-checks.
# --eval_every 2 on the heavier entries cuts per-epoch eval cost
# protocol-identically on BOTH sides. CPU-forced so the TPU stays free;
# continues past failures; logs to tools/regen_parity_r4.log.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
LOG=tools/regen_parity_r4.log
touch "$LOG"

# done_already/run live in the shared lib (idempotent AND monotone skip
# rule — one copy, also used by the parallel lane scripts)
source tools/regen_r4_lib.sh

# --- tier mlfull: item-cold, cheapest-first so upgrades bank early ---
run --model MF         --scale mlfull --epochs 15
run --model DeepMusic  --scale mlfull --epochs 12 --shared_backbone
run --model GAR        --scale mlfull --epochs 10 --shared_backbone
run --model LightGCN   --scale mlfull --epochs 6
run --model Heater     --scale mlfull --epochs 10 --shared_backbone --eval_every 2
run --model DropoutNet --scale mlfull --epochs 10 --shared_backbone --eval_every 2
run --model GoRec      --scale mlfull --epochs 8  --shared_backbone --eval_every 2

# --- user-cold at mlfull (content width 3,469) ---
run --model DeepMusic  --cold_object user --scale mlfull --epochs 8 --shared_backbone --eval_every 2
run --model DropoutNet --cold_object user --scale mlfull --epochs 8 --shared_backbone --eval_every 2

# --- the heavy one: CCFCRec (ref ~77 s/ep at ml; attribute attention
#     at content width 206) ---
run --model CCFCRec    --scale mlfull --epochs 5 --shared_backbone --eval_every 2

# --- VERDICT task 5: CGRC + M2VAE upgraded from medium to ml ---
run --model CGRC  --scale ml --epochs 4 --eval_every 2
run --model M2VAE --scale ml --epochs 4 --eval_every 2

# --- VERDICT task 2: XING-statistics spot-checks ---
run --model MF        --scale xing --epochs 4 --eval_every 2
run --model DeepMusic --scale xing --epochs 4 --shared_backbone --eval_every 2

echo "== regen r4 complete ==" | tee -a "$LOG"
grep -c OK "$LOG" || true
