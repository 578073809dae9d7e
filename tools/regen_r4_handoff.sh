#!/usr/bin/env bash
# Waits for a lane's completion marker, then launches the follow-on lane.
# Usage: regen_r4_handoff.sh <watch_log> <marker> <next_script>
set -u
cd "$(dirname "$0")/.."
WATCH="$1" MARKER="$2" NEXT="$3"
while true; do
  if grep -q "$MARKER" "$WATCH" 2>/dev/null; then
    echo "[handoff] $MARKER seen in $WATCH -> launching $NEXT"
    exec bash "$NEXT"
  fi
  sleep 60
done
