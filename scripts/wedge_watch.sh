#!/usr/bin/env bash
# Tight wedge detector for TRAINING processes (SURVEY §5.3 failure handling).
#
# The axon tunnel occasionally wedges a live process mid-dispatch: CPU spins
# in syscalls, no output, no checkpoints (observed r4 twice, r5 once — 23 min
# lost). run_resilient's generic stall window must cover cold compiles, so it
# is 2400 s; but once a trainer has WRITTEN a checkpoint this session, epochs
# land every ~60-90 s and a much tighter window is safe. This watcher:
#   - finds python processes whose cmdline matches training.train without
#     --metric (training, not eval);
#   - if the newest weights_ep* under the run's exp dir is newer than the
#     process start (the process has proven itself) and then goes stale for
#     > TIGHT seconds, TERM/KILL the pid — run_resilient restarts it and the
#     resume costs ~2 min against the warm compile cache;
#   - otherwise leaves it to run_resilient's 2400 s window (cold compiles).
#
# Usage: wedge_watch.sh [deadline_epoch_s] [tight_s]
set -u
DEADLINE=${1:-0}
TIGHT=${2:-420}
EXP_ROOT=${GCP_EXP_DIR:-/root/exp}

log() { echo "[wedge_watch $(date +%H:%M:%S)] $*" >&2; }

newest_ckpt_mtime() { # <weights_dir>
    local best=0 m d
    for d in "$1"/weights_ep*; do
        [ -d "$d" ] || continue
        m=$(stat -c %Y "$d" 2>/dev/null) || continue
        (( m > best )) && best=$m
    done
    echo "$best"
}

while :; do
    now=$(date +%s)
    [ "$DEADLINE" != "0" ] && (( now > DEADLINE )) && { log "deadline — exiting"; exit 0; }
    for p in /proc/[0-9]*/cmdline; do
        pid=${p#/proc/}; pid=${pid%/cmdline}
        # only the python trainer itself — run_resilient (bash) carries the
        # same args in its cmdline and must NOT be killed (killing the
        # wrapper orphans the trainer and lets the queue advance early)
        comm=$(cat "/proc/$pid/comm" 2>/dev/null) || continue
        case $comm in python*) ;; *) continue ;; esac
        [ -r "$p" ] || continue  # pid may exit between glob and read
        cmd=$(tr '\0' ' ' < "$p" 2>/dev/null) || continue
        case $cmd in
            *video_gcp_tpu.training.train*) ;;
            *) continue ;;
        esac
        case $cmd in *--metric*) continue ;; esac
        # exp subpath follows --path
        sub=$(printf '%s' "$cmd" | sed -n 's/.*--path \([^ ]*\).*/\1/p')
        sub=${sub#experiments/prediction/}
        wdir=$EXP_ROOT/prediction/$sub/weights
        [ -d "$wdir" ] || continue
        start=$(stat -c %Y "/proc/$pid" 2>/dev/null) || continue
        ck=$(newest_ckpt_mtime "$wdir")
        # only act after this process has produced a checkpoint itself
        (( ck > start )) || continue
        if (( now - ck > TIGHT )); then
            log "pid $pid ($sub): checkpoint stale $(( now - ck ))s — killing"
            kill -TERM "$pid" 2>/dev/null
            sleep 5
            kill -0 "$pid" 2>/dev/null && kill -KILL "$pid" 2>/dev/null
        fi
    done
    sleep 30
done
