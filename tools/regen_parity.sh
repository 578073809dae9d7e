#!/usr/bin/env bash
# Regenerate every parity artifact with the round-2 harness (SE-based
# tolerance, all 4 metrics, runs=5). Tiering (VERDICT round 1, task 1):
#   - ml scale for the models whose round-1 artifacts carried the
#     cold-metric noise cloud (MF / LightGCN / NGCF) plus the BASELINE
#     suite configs;
#   - medium scale for the remaining models (reference CPU cost at ml
#     would exceed the round budget; medium's 5-run SE already gives
#     per-cell tolerances well under 0.03);
#   - small scale only for USIM (reference PPO is CPU-bound python).
# CPU-forced on both sides so the real TPU stays free; continues past
# individual failures and logs per-model timing to tools/regen_parity.log.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
LOG=tools/regen_parity.log
touch "$LOG"

# Idempotent: a model is skipped when its artifact already matches the
# requested (scale, runs=5, cold_object) — lets an interrupted sweep resume.
done_already() { # done_already <model> <scale> <user|item>
  python - "$1" "$2" "$3" <<'PY'
import json, sys
model, scale, obj = sys.argv[1:4]
path = f"tools/PARITY_{model}{'' if obj == 'item' else '_user'}.json"
try:
    d = json.load(open(path))
except Exception:
    sys.exit(1)
sys.exit(0 if d.get("scale") == scale and d.get("runs") == 5 else 1)
PY
}

run() { # run --model <m> [--cold_object user] --scale <s> [...]
  local model="" scale="" obj=item a
  local -a argv=("$@")
  for ((a = 0; a < $#; a++)); do
    case "${argv[a]}" in
      --model) model="${argv[a+1]}" ;;
      --scale) scale="${argv[a+1]}" ;;
      --cold_object) obj="${argv[a+1]}" ;;
    esac
  done
  if done_already "$model" "$scale" "$obj"; then
    echo "== skip $model ($obj, $scale: artifact current)" | tee -a "$LOG"
    return
  fi
  local t0=$SECONDS
  echo "== [$(date +%H:%M:%S)] parity $*" | tee -a "$LOG"
  if python tools/parity_check.py --runs 5 "$@" >> "$LOG" 2>&1; then
    echo "   OK  ($((SECONDS-t0))s)" | tee -a "$LOG"
  else
    echo "   FAIL($((SECONDS-t0))s)  <<<<<<" | tee -a "$LOG"
  fi
}

# --- tier 1: ml scale — clears the round-1 LightGCN/NGCF cold-noise cloud
run --model MF        --scale ml --epochs 20
run --model LightGCN  --scale ml --epochs 6
run --model NGCF      --scale ml --epochs 6
run --model DropoutNet --scale ml --epochs 10
run --model ALDI      --scale ml --epochs 10
run --model GAR       --scale ml --epochs 10

# --- tier 2: medium scale, item cold-start
run --model SimGCL    --scale medium --epochs 15
run --model XSimGCL   --scale medium --epochs 15
run --model NCL       --scale medium --epochs 15
run --model KNN       --scale medium --epochs 15
run --model DeepMusic --scale medium --epochs 15
run --model DUIF      --scale medium --epochs 15
run --model VBPR      --scale medium --epochs 15
run --model AMR       --scale medium --epochs 15
run --model MTPR      --scale medium --epochs 15
run --model LARA      --scale medium --epochs 15
run --model Heater    --scale medium --epochs 15
run --model MetaEmbedding --scale medium --epochs 15
run --model CLCRec    --scale medium --epochs 15
run --model GoRec     --scale medium --epochs 15
run --model CCFCRec   --scale medium --epochs 10
run --model AGNN      --scale medium --epochs 10
run --model CGRC      --scale medium --epochs 6
run --model FSGNN     --scale medium --epochs 10
run --model M2VAE     --scale medium --epochs 8
run --model USIM      --scale small  --epochs 8

# --- tier 3: user cold-start (shared backbone kills backbone-draw
#     variance, round-1 convention; see --shared_backbone help)
for m in DeepMusic DUIF VBPR AMR DropoutNet MTPR LARA Heater \
         MetaEmbedding GAR GoRec AGNN FSGNN; do
  run --model "$m" --cold_object user --scale medium --epochs 12 --shared_backbone
done

echo "== regen complete ==" | tee -a "$LOG"
grep -c OK "$LOG" || true
