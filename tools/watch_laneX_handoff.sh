#!/usr/bin/env bash
# When lane X (pgid 28725) reaches its DeepMusic-xing entry, kill the
# whole lane X process group (exact pgid, our own lane) so the entry runs
# instead on lane Y's TPU path -- the CPU attempt under 3-lane contention
# would not finish before round close. MF-xing is unaffected: its entry
# completes before the DeepMusic line appears in the log.
cd "$(dirname "$0")/.."
for _ in $(seq 1 200); do
  if ! kill -0 28725 2>/dev/null; then exit 0; fi
  if grep -q "parity(timeout 7200s) --model DeepMusic" tools/regen_r5_laneX.log; then
    kill -INT -- -28725 2>/dev/null
    sleep 45
    kill -TERM -- -28725 2>/dev/null
    grep -vx 28725 tools/.parity_lane_pgids > tools/.plpw.$$ 2>/dev/null
    mv tools/.plpw.$$ tools/.parity_lane_pgids
    echo "[watcher] lane X killed at DeepMusic handoff" >> tools/regen_r5_laneX.log
    exit 0
  fi
  sleep 60
done
