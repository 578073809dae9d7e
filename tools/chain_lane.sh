#!/usr/bin/env bash
# chain_lane.sh <pid_to_wait_for> <lane_script>: launch a lane only after
# an existing lane's shell pid exits, so two lanes never oversubscribe the
# 4-core host. exec keeps this shell's (setsid) pgid for the lane.
while kill -0 "$1" 2>/dev/null; do sleep 60; done
exec bash "$2"
