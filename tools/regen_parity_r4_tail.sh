#!/usr/bin/env bash
# Appendix queue: entries that failed in the main r4 queue (stale-module
# kill of the in-flight MF run) — re-run after the main queue finishes.
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
LOG=tools/regen_parity_r4.log
# wait for the main queue to drain
while pgrep -f "regen_parity_r4.sh" > /dev/null 2>&1; do sleep 60; done
echo "== [$(date +%H:%M:%S)] tail queue: MF mlfull retry" | tee -a "$LOG"
t0=$SECONDS
if python tools/parity_check.py --runs 5 --model MF --scale mlfull --epochs 15 >> "$LOG" 2>&1; then
  echo "   OK  ($((SECONDS-t0))s)" | tee -a "$LOG"
else
  echo "   FAIL($((SECONDS-t0))s)  <<<<<<" | tee -a "$LOG"
fi
