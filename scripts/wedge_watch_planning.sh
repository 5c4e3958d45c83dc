#!/usr/bin/env bash
# Wedge detector for PLANNING/control processes (SURVEY §5.3 failure
# handling), sibling of wedge_watch.sh (which covers trainers).
#
# The axon tunnel occasionally wedges a live process mid-dispatch (futex
# sleep, zero CPU, no output — observed r5d on control task 6: 8+ min lost
# before a manual kill). Control tasks land a task_N.pkl in the run's log
# dir every ~40 s once warm, so staleness of that dir is a reliable pulse.
# For every python whose cmdline matches planning.run + a control mod_hyper:
#   - derive the progress dir (<conf_dir>/log) from the cmdline;
#   - if the dir's newest mtime (or the process start, when the dir is
#     still empty — cold compile) goes stale for > TIGHT seconds, TERM/KILL
#     the pid; run_resilient restarts it and per-task resume skips the
#     tasks already scored.
#
# Usage: wedge_watch_planning.sh [deadline_epoch_s] [tight_s]
set -u
DEADLINE=${1:-0}
TIGHT=${2:-420}

log() { echo "[wedge_watch_planning $(date +%H:%M:%S)] $*" >&2; }

newest_mtime() { # <dir> -> newest mtime underneath (0 when absent/empty)
    local best=0 m f
    [ -d "$1" ] || { echo 0; return; }
    while IFS= read -r f; do
        m=$(stat -c %Y "$f" 2>/dev/null) || continue
        (( m > best )) && best=$m
    done < <(find "$1" -mindepth 1 -maxdepth 1 2>/dev/null)
    echo "$best"
}

while :; do
    now=$(date +%s)
    [ "$DEADLINE" != "0" ] && (( now > DEADLINE )) && { log "deadline — exiting"; exit 0; }
    for p in /proc/[0-9]*/cmdline; do
        pid=${p#/proc/}; pid=${pid%/cmdline}
        cmd=$({ tr '\0' ' ' < "$p"; } 2>/dev/null) || continue
        case $cmd in
            python*video_gcp_tpu.planning.run*mod_hyper.py*) ;;
            *) continue ;;
        esac
        # datagen runs on CPU and never touches the tunnel — skip them
        case $cmd in *data_gen*) continue ;; esac
        conf=$(echo "$cmd" | grep -oE '[^ ]*mod_hyper\.py' | head -1)
        [ -n "$conf" ] || continue
        prog=$(dirname "$conf")/log
        started=$(stat -c %Y "/proc/$pid" 2>/dev/null) || continue
        newest=$(newest_mtime "$prog")
        (( newest < started )) && newest=$started
        if (( now - newest > TIGHT )); then
            log "pid $pid wedged ($((now - newest))s since progress in $prog) — killing"
            kill -TERM "$pid" 2>/dev/null
            sleep 5
            kill -0 "$pid" 2>/dev/null && kill -KILL "$pid" 2>/dev/null
        fi
    done
    sleep 30
done
