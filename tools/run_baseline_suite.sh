#!/usr/bin/env bash
# Reproduce the five BASELINE.json configs head-to-head against the PyTorch
# reference (writes tools/PARITY_*.json). CPU-forced so the reference and
# this framework share identical conditions; expect ~2h total at ML scale.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=

# 1. BPR-MF warm pretrain on MovieLens scale, item cold-start
python tools/parity_check.py --model MF         --epochs 20 --runs 2 --scale ml
# 2. LightGCN warm recommender (sparse graph propagation)
python tools/parity_check.py --model LightGCN   --epochs 6  --runs 2 --scale ml
# 3. DropoutNet cold-start generator over the MF backbone
python tools/parity_check.py --model DropoutNet --epochs 10 --runs 2 --scale ml
# 4. ALDI + GAR cold-start generators
python tools/parity_check.py --model ALDI       --epochs 10 --runs 2 --scale ml
python tools/parity_check.py --model GAR        --epochs 10 --runs 2 --scale ml
# 5. XSimGCL contrastive pretrain + Heater, user cold-start, 3-way eval
python tools/parity_check.py --model Heater --backbone XSimGCL \
    --cold_object user --epochs 15 --runs 2 --scale small

echo "== BASELINE suite complete; results in tools/PARITY_*.json =="
