#!/usr/bin/env bash
# Shared helpers for the round-4 parity lanes (sourced, not executed).
# done_already is idempotent AND monotone: a fresher artifact at >= the
# requested tier with runs>=5 and harness v3 skips the entry.

done_already() { # done_already <model> <scale> <user|item>
  python - "$1" "$2" "$3" <<'PY'
import json, sys
model, scale, obj = sys.argv[1:4]
suffix = "" if obj == "item" else "_user"
if scale == "xing":
    suffix += "_xing"
path = f"tools/PARITY_{model}{suffix}.json"
rank = {"small": 0, "medium": 1, "ml": 2, "mlfull": 3, "xing": 3}
try:
    d = json.load(open(path))
except Exception:
    sys.exit(1)
ok = (
    d.get("runs", 0) >= 5
    and rank.get(d.get("scale"), -1) >= rank[scale]
    and d.get("harness_version") == 3
)
sys.exit(0 if ok else 1)
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

# --- round-5 additions ---

lane_register_pgid() {
  # ADVICE r4: record the REAL pgid (== $$ only when the lane is a group
  # leader) and remove it again on exit so bench.py never acts on stale
  # pids after a reboot (bench.py also validates /proc/<pgid>/cmdline).
  LANE_PGID=$(ps -o pgid= -p $$ | tr -d ' ')
  echo "$LANE_PGID" >> tools/.parity_lane_pgids
  # shellcheck disable=SC2064
  trap "grep -vx '$LANE_PGID' tools/.parity_lane_pgids > tools/.plp.$$ 2>/dev/null; mv tools/.plp.$$ tools/.parity_lane_pgids" EXIT
}

run_to() { # run_to <timeout_s> <run-args...> -- bounded entry so one slow
  # reference config cannot monopolize a lane for the whole round (the
  # CGRC-ml lesson, tools/CGRC_ML_COST.json). SIGINT makes parity_check's
  # subprocess.run kill the reference child too.
  local t="$1"; shift
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
  echo "== [$(date +%H:%M:%S)] parity(timeout ${t}s) $*" | tee -a "$LOG"
  # --foreground keeps the child in the LANE's process group (default
  # timeout setpgids the child into a fresh group, which escapes the
  # registered pgid and defeats bench.py's baseline pause). On timeout,
  # INT -> parity_check's KeyboardInterrupt -> subprocess.run kills the
  # reference child.
  timeout --foreground --signal=INT --kill-after=120 "$t" \
    python tools/parity_check.py --runs 5 "$@" >> "$LOG" 2>&1
  local rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "   OK  ($((SECONDS-t0))s)" | tee -a "$LOG"
  elif [ "$rc" -eq 124 ]; then
    echo "   TIMEOUT after ${t}s <<<<<< (host-infeasible candidate)" | tee -a "$LOG"
  else
    echo "   FAIL($((SECONDS-t0))s) rc=$rc <<<<<<" | tee -a "$LOG"
  fi
}
