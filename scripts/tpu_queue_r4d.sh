#!/usr/bin/env bash
# Round-4 queue, part d: relaunch after a VM restart wiped /root/data and
# /root/exp mid-queue (the second wipe this project has absorbed; every stage
# below is per-file / per-epoch resumable for exactly this reason).
#
# State at relaunch (all committed in PARITY.md / experiments/*/results):
#   - tree-vs-sequential @T=500 row landed (tree ep22 PSNR 13.79 vs seq 12.41)
#   - 12k-trajectory training + 20/100-task control landed
#   - fused-GN A/B landed
# Remaining from tpu_queue_r4c.sh, in value order:
#   1. 25-room flagship (datagen relaunched separately -> train 75ep fused-GN
#      -> top-of-100 stock eval) — round-3 verdict item 3, still open
#   2. regenerate nav_9rooms (2k) -> decoder-controlled adaptive ablation
#      (gcp_adaptive_dlm) — round-3 verdict item 9
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
R=scripts/run_resilient.sh
T=video_gcp_tpu.training.train

stage() { echo "[queue4d $(date +%H:%M:%S)] $*" >&2; }

resume_datagen() { # <dataset> <n_trajs>
    local ds=$1 n=$2 first=0
    while [ "$first" -lt "$n" ] \
            && [ -f "$GCP_DATA_DIR/$ds/traj_${first}.h5" ]; do
        first=$((first + 1))
    done
    if [ "$first" -lt "$n" ]; then
        stage "$ds datagen: resuming at traj_$first (CPU)"
        JAX_PLATFORMS=cpu nice -n 10 python -m video_gcp_tpu.planning.run \
            "experiments/data_gen/$ds/mod_hyper.py" \
            --start_idx "$first" --end_idx $((n - 1))
    fi
}

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

# wait for the separately-launched 25-room datagen (pid in /tmp/datagen25.pid)
if [ -f /tmp/datagen25.pid ] && kill -0 "$(cat /tmp/datagen25.pid)" 2>/dev/null; then
    stage "waiting for 25-room datagen pid $(cat /tmp/datagen25.pid)"
    while kill -0 "$(cat /tmp/datagen25.pid)" 2>/dev/null; do sleep 30; done
fi
resume_datagen nav_25rooms 1000   # in case the launcher died early

# --- 7. 25-room flagship (fused-GN training, stock eval) ----------------
if [ -f "$GCP_DATA_DIR/nav_25rooms/traj_999.h5" ]; then
    train_then_eval 25room/gcp_tree 75 2400 2400 1
else
    stage "SKIP 25room flagship: datagen incomplete"
fi

# --- 9. decoder-controlled adaptive ablation ----------------------------
resume_datagen nav_9rooms 2000
if [ -f "$GCP_DATA_DIR/nav_9rooms/traj_1999.h5" ]; then
    train_then_eval 9room/gcp_adaptive_dlm 75 2400 1800 0
else
    stage "SKIP adaptive_dlm: 9-room datagen incomplete"
fi

stage "queue4d complete"
