#!/usr/bin/env bash
# Round-5 tail: mop up leftover chip time after the main queue drains.
# The main queue (tpu_queue_r5.sh) gates the adaptive-DLM stage on a 3h
# budget fitting before QUEUE_DEADLINE; with a shorter tail window a PARTIAL
# adaptive-DLM run (train_deadline-capped, eval at the achieved epoch with
# the honest _epN_partial suffix, ADVICE r4 #1) is still worth having for
# the de-confound table (VERDICT r4 ask #5). Idempotent: skips anything the
# main queue already produced.
#
# Launch (only after the main queue exits):
#   setsid bash scripts/tpu_queue_r5_tail.sh > logs/queue_r5_tail.log 2>&1 &
#   bash scripts/driver_watch2.sh <pgid> >> logs/driver_watch.log 2>&1 &
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
R=scripts/run_resilient.sh
T=video_gcp_tpu.training.train
DEADLINE=${QUEUE_DEADLINE:?tail requires QUEUE_DEADLINE}

stage() { echo "[tail5 $(date +%H:%M:%S)] $*" >&2; }

train_then_eval() { # <exp_subpath> <num_epochs> <eval_budget> [extra...]
    local exp=$1 epochs=$2 ebudget=$3
    shift 3
    local dir=$GCP_EXP_DIR/prediction/$exp
    local td=$(( DEADLINE - ebudget ))
    if [ ! -d "$dir/weights/weights_ep$((epochs - 1))" ] \
            && (( td > $(date +%s) + 300 )); then
        stage "$exp: training toward $epochs epochs (deadline in $(( td - $(date +%s) ))s)"
        GCP_FUSED_GN=0 $R "$dir/weights" 2400 20 python -m $T \
            --path "experiments/prediction/$exp" --num_epochs "$epochs" \
            --train_deadline "$td"
    fi
    local achieved=-1 d n
    for d in "$dir"/weights/weights_ep*; do
        [ -d "$d" ] || continue
        n=${d##*weights_ep}
        case $n in *[!0-9]*) continue;; esac
        (( n > achieved )) && achieved=$n
    done
    [ "$achieved" -lt 0 ] && { stage "$exp: no checkpoint — skip eval"; return 1; }
    if ! ls "$dir"/metrics/results_*.txt >/dev/null 2>&1; then
        stage "$exp: top-of-100 eval (achieved ep$achieved)"
        GCP_FUSED_GN=0 $R "$dir/metrics" 1800 4 python -m $T \
            --path "experiments/prediction/$exp" --metric 1 "$@"
    fi
    if ls "$dir"/metrics/results_*.txt >/dev/null 2>&1; then
        mkdir -p "experiments/prediction/$exp/results"
        local suffix=""
        [ "$achieved" -lt $((epochs - 1)) ] && suffix="_ep${achieved}_partial"
        for f in "$dir"/metrics/results_*.txt; do
            local b; b=$(basename "$f" .txt)
            cp -f "$f" "experiments/prediction/$exp/results/${b}${suffix}.txt"
        done
        python scripts/dump_scalar_trace.py "$dir/events" "" \
            "experiments/prediction/$exp/results/scalar_trace.csv" \
            2>/dev/null || stage "$exp: scalar trace dump failed"
    fi
}

# adaptive-DLM de-confound: any trained prefix + eval beats nothing
if [ -f "$GCP_DATA_DIR/nav_9rooms/traj_1999.h5" ]; then
    train_then_eval 9room/gcp_adaptive_dlm 75 1800
fi

stage "tail complete"
