#!/usr/bin/env bash
# Round-5 lane W: DeepMusic xing on the PROVEN CPU path (MF-xing passed
# this way). The TPU attempt (lane Z) hit RESOURCE_EXHAUSTED in the eval
# sweep at the xing shape on 16 GB HBM -- diagnosis deferred (likely the
# async-queued eval chunks or the kernel's exact-fallback at large R);
# accuracy parity is platform-independent.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= OMP_NUM_THREADS=2
LOG=tools/regen_r5_laneW.log
touch "$LOG"
source tools/regen_r4_lib.sh
lane_register_pgid

run_to 9000 --model DeepMusic --scale xing --epochs 4 --shared_backbone --eval_every 2

echo "== lane W complete ==" | tee -a "$LOG"
