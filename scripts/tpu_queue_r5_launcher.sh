#!/usr/bin/env bash
# Round-5 launcher: finish all CPU datagen first (single-core box — keep the
# chip-feeding core free during training), then run the experiment queue.
# Launch with:
#   setsid bash scripts/tpu_queue_r5_launcher.sh > logs/queue_r5.log 2>&1 &
#   bash scripts/driver_watch2.sh <pid> >> logs/driver_watch.log 2>&1 &
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
RUN=video_gcp_tpu.planning.run

say() { echo "[launcher5 $(date +%H:%M:%S)] $*" >&2; }

gen() { # <dataset> <n>
    local ds=$1 n=$2 maxi=-1 i
    for f in "$GCP_DATA_DIR/$ds"/traj_*.h5; do
        [ -e "$f" ] || continue
        i=${f##*traj_}; i=${i%.h5}
        (( i > maxi )) && maxi=$i
    done
    if [ $((maxi + 1)) -lt "$n" ]; then
        say "$ds: generating traj_$((maxi + 1))..$((n - 1))"
        GCP_PLATFORM=cpu python -m "$RUN" \
            "experiments/data_gen/$ds/mod_hyper.py" \
            --start_idx $((maxi + 1)) --end_idx $((n - 1))
    else
        say "$ds: complete ($n trajs)"
    fi
}

# wait for any already-running 9-room datagen to drain (started by hand).
# ADVICE r4 #2: verify the pid is actually a datagen python before waiting —
# a recycled pid from an unrelated process must not wedge the queue.
if [ -f /tmp/datagen9.pid ]; then
    DPID=$(cat /tmp/datagen9.pid)
    if grep -qa "video_gcp_tpu.planning.run" "/proc/$DPID/cmdline" 2>/dev/null; then
        say "waiting for in-flight nav_9rooms datagen (pid $DPID)"
        while kill -0 "$DPID" 2>/dev/null; do sleep 10; done
    fi
fi
gen nav_9rooms 2000
gen nav_25rooms 1000
# nav_25rooms_long (T=500) is NOT pre-generated here: only the last,
# deadline-gated queue stage needs it, and generating it up front would idle
# the chip ~25 min on this 1-core VM before the flagship could start.
if [ ! -d "$GCP_DATA_DIR/nav_9rooms/start_goal_configs/raw" ]; then
    say "start/goal task configs"
    GCP_PLATFORM=cpu python -m "$RUN" \
        experiments/data_gen/nav_9rooms_start_goal/mod_hyper.py
fi

say "datagen complete — starting queue (deadline ${QUEUE_DEADLINE:-none})"
bash scripts/tpu_queue_r5.sh
