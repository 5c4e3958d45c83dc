#!/usr/bin/env bash
# Round-4 master TPU queue (replaces tpu_queue_r4.sh's tail stages; run AFTER
# the 12k nav_9rooms datagen completes). Serialized — single chip. Stages in
# round-4 verdict priority order, each per-epoch/per-task resumable so the
# queue can be stopped at any time and relaunched:
#   1. (CPU) 9-room start/goal benchmark configs
#   2. gcp_tree_12k: reference-data-scale training (100 epochs on 12k trajs)
#   3. its top-of-100 eval
#   4. 20-task closed-loop control benchmark with the 12k checkpoint
#   5. T=500 sequential on nav_25rooms_long (controlled tree-vs-seq: same
#      data/budget as the round-3 tree@500 run) + top-of-100 eval
#      [needs nav_25rooms_long datagen — run separately, CPU]
#   6. re-train tree@500 for the same-budget comparison row (round-3 weights
#      were wiped with /root/exp) + eval
#   7. 25-room flagship (untied L=8, T=200) 75 epochs + eval
#      [needs nav_25rooms datagen — run separately, CPU]
#   8. extend control to the reference's 100-task protocol
#   9. gcp_adaptive_dlm (decoder-controlled adaptive ablation) + eval
#  10. gcp_adaptive_12k if time remains
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
R=scripts/run_resilient.sh
T=video_gcp_tpu.training.train
RUN=video_gcp_tpu.planning.run

stage() { echo "[queue4b $(date +%H:%M:%S)] $*" >&2; }

train_then_eval() { # <exp_subpath> <num_epochs> <train_stall> <eval_stall> [extra eval flags...]
    local exp=$1 epochs=$2 tstall=$3 estall=$4
    shift 4
    local dir=$GCP_EXP_DIR/prediction/$exp
    if [ ! -d "$dir/weights/weights_ep$((epochs - 1))" ]; then
        stage "$exp: training to $epochs epochs"
        $R "$dir/weights" "$tstall" 20 python -m $T \
            --path "experiments/prediction/$exp" --num_epochs "$epochs"
    fi
    if ! ls "$dir"/metrics/results_*.txt >/dev/null 2>&1; then
        stage "$exp: top-of-100 eval"
        $R "$dir/metrics" "$estall" 4 python -m $T \
            --path "experiments/prediction/$exp" --metric 1 "$@"
    fi
    # commit-able evidence: metrics + scalar trace live in-repo, next to the
    # experiment config (round-3 /root/exp artifacts died with the VM)
    if ls "$dir"/metrics/results_*.txt >/dev/null 2>&1; then
        mkdir -p "experiments/prediction/$exp/results"
        cp -f "$dir"/metrics/results_*.txt "experiments/prediction/$exp/results/"
        python scripts/dump_scalar_trace.py "$dir/events" "" \
            "experiments/prediction/$exp/results/scalar_trace.csv" \
            2>/dev/null || stage "$exp: scalar trace dump failed"
    fi
}

# --- 1. start/goal configs (CPU) ---------------------------------------
if [ ! -d "$GCP_DATA_DIR/nav_9rooms/start_goal_configs/raw" ]; then
    stage "9-room start/goal benchmark configs (CPU)"
    JAX_PLATFORMS=cpu python -m $RUN \
        experiments/data_gen/nav_9rooms_start_goal/mod_hyper.py
fi

# --- 2./3. reference-data-scale 9-room tree ----------------------------
# 70 epochs (not the originally queued 100): at the measured 3.2 min/epoch the
# extra 30 epochs would push top-of-100 + control past the round boundary, and
# the round-3 ep74-vs-ep199 ablation showed epoch count is not the binding
# constraint. 70 epochs on 12k trajs ~= 5.6x the gradient steps of the round-3
# 2k-trajectory runs.
# published split frac (val=0.006) gives ~72 val trajs at 12k: eval ~5-8 min
train_then_eval 9room/gcp_tree_12k 67 2400 1800

# --- 3b. fused-GN A/B on the bench rollout (short; committed artifact) --
# round-4's fused_gn_ab.json carries a contention caveat (stock half ran a
# minute after a control job released the chip); regenerate a clean one on a
# quiet chip
if [ ! -f experiments/profiles/fused_gn_ab_clean.json ]; then
    stage "fused GroupNorm A/B bench (clean)"
    timeout 1200 python scripts/ab_fused_gn.py \
        experiments/profiles/fused_gn_ab_clean.json \
        || stage "fused GN A/B failed (non-fatal)"
fi

# --- 4. 20-task control with the 12k checkpoint ------------------------
CTRL=experiments/control/9room/gcp_tree_12k/log
# gate on the LAST task pkl: scores_*.pkl is written incrementally after
# every task, so its existence does not mean the range completed
if [ ! -f "$CTRL/task_19.pkl" ]; then
    stage "20-task control benchmark (12k checkpoint)"
    $R "$CTRL" 1800 10 python -m $RUN \
        experiments/control/9room/gcp_tree_12k/mod_hyper.py \
        --start_idx 0 --end_idx 19
    python -m video_gcp_tpu.evaluation.compute_control_perf \
        --path "$CTRL/scores_0to19.pkl" || stage "compute_control_perf failed"
fi

# --- 8 (moved up). 100-task control protocol ----------------------------
# Per-task resumable, so it degrades gracefully at the round boundary; the
# multi-hour T=500 / 25-room training stages below would not.
if [ ! -f "$CTRL/task_99.pkl" ]; then
    stage "extend control to 100 tasks (per-task resumable)"
    $R "$CTRL" 1800 30 python -m $RUN \
        experiments/control/9room/gcp_tree_12k/mod_hyper.py \
        --start_idx 0 --end_idx 99
    python -m video_gcp_tpu.evaluation.compute_control_perf \
        --path "$CTRL/scores_0to99.pkl" \
        || stage "compute_control_perf failed for 0to99"
fi

# --- 5./6. controlled tree-vs-sequential at T=500 -----------------------
if [ -f "$GCP_DATA_DIR/nav_25rooms_long/traj_399.h5" ]; then
    train_then_eval 25room_long/gcp_sequential 30 2400 2400
    train_then_eval 25room_long/gcp_tree 30 2400 2400
else
    stage "SKIP 25room_long: datagen incomplete"
fi

# --- 7. 25-room flagship ------------------------------------------------
if [ -f "$GCP_DATA_DIR/nav_25rooms/traj_999.h5" ]; then
    train_then_eval 25room/gcp_tree 75 2400 2400
else
    stage "SKIP 25room flagship: datagen incomplete"
fi

# --- 9. decoder-controlled adaptive ablation ----------------------------
train_then_eval 9room/gcp_adaptive_dlm 75 2400 1800

# --- 10. adaptive at data scale (stretch) -------------------------------
train_then_eval 9room/gcp_adaptive_12k 100 2400 1800

stage "queue4b complete"
