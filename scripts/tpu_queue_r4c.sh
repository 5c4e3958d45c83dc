#!/usr/bin/env bash
# Round-4 queue, part 2 — the post-12k-training stages of tpu_queue_r4b.sh,
# for when the 100-epoch 12k training is cut short for time: run the eval +
# control + comparison stages against the LATEST tree_12k checkpoint instead
# of waiting for weights_ep99. All stages idempotent/resumable; safe to
# re-run. Usage: stop the r4b queue (and its training child), then
#   bash scripts/tpu_queue_r4c.sh
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
R=scripts/run_resilient.sh
T=video_gcp_tpu.training.train
RUN=video_gcp_tpu.planning.run

stage() { echo "[queue4c $(date +%H:%M:%S)] $*" >&2; }

eval_and_archive() { # <exp_subpath> <eval_stall>
    local exp=$1 estall=$2
    local dir=$GCP_EXP_DIR/prediction/$exp
    if ! ls "$dir"/metrics/results_*.txt >/dev/null 2>&1; then
        stage "$exp: top-of-100 eval (latest checkpoint)"
        $R "$dir/metrics" "$estall" 4 python -m $T \
            --path "experiments/prediction/$exp" --metric 1
    fi
    if ls "$dir"/metrics/results_*.txt >/dev/null 2>&1; then
        mkdir -p "experiments/prediction/$exp/results"
        cp -f "$dir"/metrics/results_*.txt "experiments/prediction/$exp/results/"
        python scripts/dump_scalar_trace.py "$dir/events" "" \
            "experiments/prediction/$exp/results/scalar_trace.csv" \
            2>/dev/null || stage "$exp: scalar trace dump failed"
    fi
}

train_then_eval() { # <exp_subpath> <num_epochs> <train_stall> <eval_stall>
    local exp=$1 epochs=$2 tstall=$3 estall=$4
    local dir=$GCP_EXP_DIR/prediction/$exp
    if [ ! -d "$dir/weights/weights_ep$((epochs - 1))" ]; then
        stage "$exp: training to $epochs epochs"
        $R "$dir/weights" "$tstall" 20 python -m $T \
            --path "experiments/prediction/$exp" --num_epochs "$epochs"
    fi
    eval_and_archive "$exp" "$estall"
}

# --- 1. eval the 12k tree at whatever epoch it reached ------------------
eval_and_archive 9room/gcp_tree_12k 1800

# --- 2. 20-task control with the 12k checkpoint -------------------------
CTRL=experiments/control/9room/gcp_tree_12k/log
if [ ! -f "$CTRL/scores_0to19.pkl" ]; then
    stage "20-task control benchmark (12k checkpoint)"
    $R "$CTRL" 1800 10 python -m $RUN \
        experiments/control/9room/gcp_tree_12k/mod_hyper.py \
        --start_idx 0 --end_idx 19
    python -m video_gcp_tpu.evaluation.compute_control_perf \
        --path "$CTRL/scores_0to19.pkl" || stage "compute_control_perf failed"
fi

# --- 3./4. controlled tree-vs-sequential at T=500 ------------------------
train_then_eval 25room_long/gcp_sequential 30 2400 2400
train_then_eval 25room_long/gcp_tree 30 2400 2400

# --- 5. 25-room flagship -------------------------------------------------
train_then_eval 25room/gcp_tree 75 2400 2400

# --- 6. 100-task control protocol (per-task resumable; partial OK) -------
if [ ! -f "$CTRL/scores_0to99.pkl" ]; then
    stage "extend control to 100 tasks"
    $R "$CTRL" 1800 30 python -m $RUN \
        experiments/control/9room/gcp_tree_12k/mod_hyper.py \
        --start_idx 0 --end_idx 99
    python -m video_gcp_tpu.evaluation.compute_control_perf \
        --path "$CTRL/scores_0to99.pkl" \
        || stage "compute_control_perf failed for 0to99"
fi

# --- 7. decoder-controlled adaptive ablation ------------------------------
train_then_eval 9room/gcp_adaptive_dlm 75 2400 1800

stage "queue4c complete"
