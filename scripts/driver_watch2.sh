#!/usr/bin/env bash
# Chip-sharing guard, round-5 revision. The driver benches bench.py /
# __graft_entry__.py on the real chip at round end; a concurrently running
# experiment queue would corrupt those timings.
#
# Round-4 postmortem (VERDICT weak #1): the old depth-first kill_tree killed
# the queue's CHILDREN first, which let the queue script advance to its next
# stage and spawn a fresh TPU eval in the 1 s gap before its own kill — the
# driver bench then ran against that eval. Fix: the queue is launched with
# setsid (its own process group) and the guard kills the ENTIRE GROUP in one
# syscall (kill -- -PGID), which atomically includes any child spawned up to
# the kill instant; a follow-up loop re-kills the group until no members
# remain, so nothing spawned in flight survives.
#
# Usage: driver_watch2.sh <queue_pgid>
set -u
PGID=$1

group_alive() { kill -0 -- "-$PGID" 2>/dev/null; }

while group_alive; do
    for p in /proc/[0-9]*/cmdline; do
        pid=${p#/proc/}; pid=${pid%/cmdline}
        [ "$pid" = "$$" ] && continue
        # never match a process in the queue's own group (it may mention
        # bench.py in an argument) or ourselves
        pg=$(ps -o pgid= -p "$pid" 2>/dev/null | tr -d ' ')
        [ "$pg" = "$PGID" ] && continue
        if tr '\0' ' ' < "$p" 2>/dev/null \
                | grep -qE '(^|[ /])bench\.py|__graft_entry__\.py|dryrun_multichip'; then
            echo "[driver_watch2 $(date +%H:%M:%S)] driver process detected" \
                 "(pid $pid) — killing queue group $PGID" >&2
            for i in 1 2 3 4 5; do
                kill -TERM -- "-$PGID" 2>/dev/null
                sleep 1
                group_alive || break
                kill -KILL -- "-$PGID" 2>/dev/null
                sleep 1
                group_alive || break
            done
            echo "[driver_watch2 $(date +%H:%M:%S)] queue group gone;" \
                 "chip is quiet" >&2
            exit 0
        fi
    done
    sleep 5
done
echo "[driver_watch2 $(date +%H:%M:%S)] queue exited on its own" >&2
