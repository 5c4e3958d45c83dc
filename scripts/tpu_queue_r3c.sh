#!/usr/bin/env bash
# Round-3 TPU queue, part 3 (runs after tpu_queue_r3b.sh drains):
#   1. dataset val sweep for 25room_long (T=100 nav_9rooms vs T=500 long) —
#      the queue-1 attempt validated zero batches (short-batch drop bug,
#      fixed in trainer.run_dataset_val_sweep) and its failure log was
#      deleted by the old `|| rm` pattern; failures now keep a .failed log
#   2. extend the closed-loop control benchmark from 20 to all 100
#      start/goal tasks with the 200-epoch checkpoint (per-task resumable)
#   3. combined score summary over tasks 0..99
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
R=scripts/run_resilient.sh
T=video_gcp_tpu.training.train

if [ -n "${WAIT_PID:-}" ]; then
    echo "[queue3] waiting for pid $WAIT_PID" >&2
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

stage() { echo "[queue3 $(date +%H:%M:%S)] $*" >&2; }

LNG=$GCP_EXP_DIR/prediction/25room_long/gcp_tree
CTRL_LOG=experiments/control/9room/gcp_tree/log

if [ ! -f "$LNG/dataset_sweep.txt" ]; then
    stage "25room_long dataset val sweep (T=100 vs T=500)"
    if $R "$LNG" 2400 2 python -m $T \
        --path experiments/prediction/25room_long/gcp_tree --dataset_val_sweep 1 \
        > "$LNG/dataset_sweep.txt" 2>&1; then
        stage "sweep done"
    else
        mv "$LNG/dataset_sweep.txt" "$LNG/dataset_sweep.txt.failed"
        stage "sweep FAILED — log kept at dataset_sweep.txt.failed"
    fi
fi

if [ ! -f "$CTRL_LOG/scores_0to99.pkl" ]; then
    stage "control benchmark: extend to 100 tasks (per-task resumable)"
    $R "$CTRL_LOG" 1800 20 python -m video_gcp_tpu.planning.run \
        experiments/control/9room/gcp_tree/mod_hyper.py \
        --start_idx 0 --end_idx 99
    python -m video_gcp_tpu.evaluation.compute_control_perf \
        --path "$CTRL_LOG/scores_0to99.pkl" \
        || stage "compute_control_perf failed for 0to99"
fi

stage "queue3 complete"
