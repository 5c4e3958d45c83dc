#!/usr/bin/env bash
# Chip-sharing guard: the driver benches bench.py / __graft_entry__.py on the
# real chip at round end, and a concurrently running experiment queue would
# corrupt those timings (single chip serializes dispatches). Watch for driver
# activity and stop the queue's process tree the moment it appears.
#
# Kills are exact-pid only (parent-pid walk from the stored queue pid); the
# /proc scan is read-only. A false positive (e.g. an interactive shell whose
# command line mentions bench.py) errs in the safe direction: the queue stops
# and can be relaunched, every stage is resumable.
set -u
QUEUE_PID=$1

kill_tree() { # depth-first kill by exact pids
    local pid=$1
    for child in $(pgrep -P "$pid" 2>/dev/null); do
        kill_tree "$child"
    done
    kill "$pid" 2>/dev/null
    sleep 1
    kill -9 "$pid" 2>/dev/null
}

ME=$$
while kill -0 "$QUEUE_PID" 2>/dev/null; do
    for p in /proc/[0-9]*/cmdline; do
        pid=${p#/proc/}; pid=${pid%/cmdline}
        [ "$pid" = "$ME" ] && continue
        if tr '\0' ' ' < "$p" 2>/dev/null \
                | grep -qE '(^|[ /])bench\.py|__graft_entry__\.py|dryrun_multichip'; then
            echo "[driver_watch $(date +%H:%M:%S)] driver process detected" \
                 "(pid $pid) — stopping queue $QUEUE_PID" >&2
            kill_tree "$QUEUE_PID"
            exit 0
        fi
    done
    sleep 5
done
echo "[driver_watch $(date +%H:%M:%S)] queue exited on its own" >&2
