#!/usr/bin/env bash
# Stall-resilient TPU job driver.
#
# The remote-TPU tunnel can hang a client session indefinitely (observed:
# backend init or a dispatch blocks forever while a fresh process sails
# through). Fix = watchdog + retry: run the command, kill it if its progress
# file goes quiet, rerun. The workloads themselves are resumable (per-task
# score pkls for control benchmarks, per-epoch checkpoints for training), so
# a kill costs one unit of work.
#
# Usage: run_resilient.sh <progress_path> <stall_seconds> <max_attempts> cmd...
#   progress_path: file or directory whose mtime advances with progress
#                  (log dir with task_*.pkl, weights/ dir, ...)
#   stall_seconds: kill the attempt when progress_path is older than this
set -uo pipefail

PROGRESS=$1; STALL=$2; MAX_ATTEMPTS=$3; shift 3

newest_mtime() {
    # newest mtime under the progress path (0 when absent)
    find "$PROGRESS" -maxdepth 1 -printf '%T@\n' 2>/dev/null \
        | sort -rn | head -1 | cut -d. -f1 || echo 0
}

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
    echo "[run_resilient] attempt $attempt: $*" >&2
    "$@" &
    PID=$!
    START=$(date +%s)
    RC=""
    while true; do
        sleep 30
        if ! kill -0 "$PID" 2>/dev/null; then
            wait "$PID"; RC=$?
            break
        fi
        NOW=$(date +%s)
        LAST=$(newest_mtime); LAST=${LAST:-0}
        REF=$(( LAST > START ? LAST : START ))
        if (( NOW - REF > STALL )); then
            echo "[run_resilient] no progress for $((NOW - REF))s — killing $PID" >&2
            kill "$PID" 2>/dev/null
            sleep 5
            kill -9 "$PID" 2>/dev/null
            wait "$PID" 2>/dev/null
            RC=99
            break
        fi
    done
    if [ "$RC" = "0" ]; then
        echo "[run_resilient] success on attempt $attempt" >&2
        exit 0
    fi
    echo "[run_resilient] attempt $attempt exited rc=$RC" >&2
    # A killed attempt (ours or a wedge watcher's) can leave the remote TPU
    # service mid-dispatch; an instant respawn then wedges on backend init
    # waiting for a reply that never comes (observed r5e: two successive
    # zero-CPU attempts after one kill; a ~2.5 min quiet window + fresh
    # client recovered). Give the tunnel a cool-down before retrying.
    if [ "$RC" != "0" ] && { [ "$RC" = "99" ] || [ "$RC" -ge 128 ] 2>/dev/null; }; then
        echo "[run_resilient] cool-down 120s before next attempt" >&2
        sleep 120
    fi
done
echo "[run_resilient] giving up after $MAX_ATTEMPTS attempts" >&2
exit 1
