#!/usr/bin/env bash
# Round-4 queue, part c: the stages remaining after tpu_queue_r4b.sh's
# tree-vs-sequential block, relaunched so the 25-room flagship trains with
# the fused GroupNorm Pallas pass (GCP_FUSED_GN=1 — hardware-validated by
# experiments/profiles/fused_gn_train_ab.json before this queue starts).
# Evals run with the stock lowering so metric numbers stay attributable to
# the same math as every earlier committed table (checkpoints are
# key-compatible either way, ops/fused_gn.py).
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
R=scripts/run_resilient.sh
T=video_gcp_tpu.training.train

stage() { echo "[queue4c $(date +%H:%M:%S)] $*" >&2; }

train_then_eval() { # <exp_subpath> <num_epochs> <train_stall> <eval_stall> <fused01> [extra eval flags...]
    local exp=$1 epochs=$2 tstall=$3 estall=$4 fused=$5
    shift 5
    local dir=$GCP_EXP_DIR/prediction/$exp
    if [ ! -d "$dir/weights/weights_ep$((epochs - 1))" ]; then
        stage "$exp: training to $epochs epochs (fused_gn=$fused)"
        GCP_FUSED_GN=$fused $R "$dir/weights" "$tstall" 20 python -m $T \
            --path "experiments/prediction/$exp" --num_epochs "$epochs"
    fi
    if ! ls "$dir"/metrics/results_*.txt >/dev/null 2>&1; then
        stage "$exp: top-of-100 eval (stock lowering)"
        GCP_FUSED_GN=0 $R "$dir/metrics" "$estall" 4 python -m $T \
            --path "experiments/prediction/$exp" --metric 1 "$@"
    fi
    if ls "$dir"/metrics/results_*.txt >/dev/null 2>&1; then
        mkdir -p "experiments/prediction/$exp/results"
        cp -f "$dir"/metrics/results_*.txt "experiments/prediction/$exp/results/"
        python scripts/dump_scalar_trace.py "$dir/events" "" \
            "experiments/prediction/$exp/results/scalar_trace.csv" \
            2>/dev/null || stage "$exp: scalar trace dump failed"
    fi
}

# --- 6-finish. tree@500: driver_watch killed the r4b run at ep22 (the
# orphaned eval scored the ep22 checkpoint: PSNR 13.79, already above
# sequential@30ep's 12.41); finish the last 8 epochs + re-eval for the
# clean identical-budget row. Stock lowering, same as the sequential half.
train_then_eval 25room_long/gcp_tree 30 2400 2400 0

# --- 7. 25-room flagship (fused-GN training) ----------------------------
if [ -f "$GCP_DATA_DIR/nav_25rooms/traj_999.h5" ]; then
    train_then_eval 25room/gcp_tree 75 2400 2400 1
else
    stage "SKIP 25room flagship: datagen incomplete"
fi

# --- 9. decoder-controlled adaptive ablation ----------------------------
# stock lowering: this run's only job is to isolate the decoder family vs
# the round-3 adaptive run, which trained stock — don't add a second delta
train_then_eval 9room/gcp_adaptive_dlm 75 2400 1800 0

# --- 10. adaptive at data scale (stretch) -------------------------------
train_then_eval 9room/gcp_adaptive_12k 100 2400 1800 1

stage "queue4c complete"
