#!/usr/bin/env bash
# Stall watchdog for long TPU training runs (round 5). The remote TPU
# attachment occasionally wedges mid-run (observed round 4 and round 5:
# steps that take ~0.2 s stop arriving for 10+ minutes while the client
# process sleeps). Training banks checkpoints every N steps and resumes
# on-policy (env_carry.npz), so the correct response is: kill the EXACT
# client PID tree we started (never pattern-kill), give the attachment ~2
# minutes to recover, and relaunch with --resume.
#
# Usage: scripts/run_with_watchdog.sh <logfile-glob-to-watch> <stall-secs> \
#          <total-deadline-epoch> -- <training command...>
# The training command must be resume-safe (all scripts/train_*.sh are).
# The watch target is a GLOB resolved to the newest match on every check —
# each resume opens a fresh train_*.jsonl, so a fixed path would go stale.
set -u
WATCH_GLOB="$1"; STALL="$2"; DEADLINE="$3"; shift 3
[ "$1" = "--" ] && shift

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  "$@" &
  PID=$!
  echo "[watchdog] launched pid=$PID: $*" >&2
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    WATCH_FILE=$(ls -t $WATCH_GLOB 2>/dev/null | head -1)
    if [ -n "$WATCH_FILE" ] && [ -f "$WATCH_FILE" ]; then
      AGE=$(( $(date +%s) - $(stat -c %Y "$WATCH_FILE") ))
      if [ "$AGE" -gt "$STALL" ]; then
        echo "[watchdog] $WATCH_FILE stale ${AGE}s > ${STALL}s: killing $PID tree" >&2
        # Kill the exact process tree we own (children first).
        for C in $(ps -o pid= --ppid "$PID"); do
          for GC in $(ps -o pid= --ppid "$C"); do kill -9 "$GC" 2>/dev/null; done
          kill -9 "$C" 2>/dev/null
        done
        kill -9 "$PID" 2>/dev/null
        echo "[watchdog] waiting 120s for the attachment to recover" >&2
        sleep 120
        break
      fi
    fi
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "[watchdog] deadline reached; stopping $PID tree" >&2
      for C in $(ps -o pid= --ppid "$PID"); do
        for GC in $(ps -o pid= --ppid "$C"); do kill "$GC" 2>/dev/null; done
        kill "$C" 2>/dev/null
      done
      kill "$PID" 2>/dev/null
      exit 0
    fi
  done
  wait "$PID" 2>/dev/null
  RC=$?
  if [ "$RC" -eq 0 ]; then
    echo "[watchdog] run completed cleanly" >&2
    exit 0
  fi
  echo "[watchdog] run exited rc=$RC; relaunching (resume-safe)" >&2
  sleep 10
done
