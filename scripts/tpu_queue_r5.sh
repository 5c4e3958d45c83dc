#!/usr/bin/env bash
# Round-5 experiment queue. Addresses VERDICT r4 asks in value order:
#   1. finish the 25-room flagship (resume ep8 -> 75 epochs, top-of-100)
#   2. control-bottleneck interventions: retrain 9room/gcp_tree (2k data,
#      checkpoints were wiped), fine-tune a wide-gap inverse model from it,
#      then four 20-task control runs on the same task draw
#      (baseline / widegap / replan / cursor)
#   5. gcp_adaptive_dlm de-confound (75 epochs + top-of-100)
#   7. T=500 tree retrain to the full 30-epoch budget (checkpoint was wiped;
#      starts from scratch, deadline-gated)
#
# Chip-handoff protocol (VERDICT ask #4): launch with
#   setsid bash scripts/tpu_queue_r5.sh > logs/queue_r5.log 2>&1 &
#   bash scripts/driver_watch2.sh <queue_pid> >> logs/driver_watch.log 2>&1 &
# driver_watch2 kills the WHOLE process group when driver bench activity
# appears, so no in-flight TPU child survives the handoff. Additionally every
# stage is gated on QUEUE_DEADLINE (epoch seconds): a stage whose budget does
# not fit before the deadline is skipped, so the queue drains instead of
# being shot mid-eval.
#
# ADVICE r4 #1: the top-of-100 eval is gated on the TARGET epoch's checkpoint
# existing; when training fell short, the eval still runs but the copied
# results filename is suffixed with the achieved epoch (no silent mislabel).
# ADVICE r4 #4: datagen resume derives from the max existing index (the
# writers are contiguous today, but this stays correct if that changes).
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
R=scripts/run_resilient.sh
T=video_gcp_tpu.training.train
RUN=video_gcp_tpu.planning.run
DEADLINE=${QUEUE_DEADLINE:-0}   # 0 = no deadline

stage() { echo "[queue5 $(date +%H:%M:%S)] $*" >&2; }

fits() { # <budget_seconds> -> 0 if the stage fits before the deadline
    [ "$DEADLINE" = "0" ] && return 0
    local now; now=$(date +%s)
    if (( now + $1 > DEADLINE )); then
        stage "SKIP (deadline): stage budget $1s does not fit" \
              "($(( DEADLINE - now ))s left)"
        return 1
    fi
    return 0
}

resume_datagen() { # <dataset> <n_trajs>
    local ds=$1 n=$2 maxi=-1 i
    for f in "$GCP_DATA_DIR/$ds"/traj_*.h5; do
        [ -e "$f" ] || continue
        i=${f##*traj_}; i=${i%.h5}
        (( i > maxi )) && maxi=$i
    done
    local first=$((maxi + 1))
    if [ "$first" -lt "$n" ]; then
        stage "$ds datagen: resuming at traj_$first (CPU)"
        GCP_PLATFORM=cpu nice -n 10 python -m "$RUN" \
            "experiments/data_gen/$ds/mod_hyper.py" \
            --start_idx "$first" --end_idx $((n - 1))
    fi
}

train_then_eval() { # <exp_subpath> <num_epochs> <train_budget_s> <train_stall> <eval_stall> <fused01> [extra eval flags...]
    local exp=$1 epochs=$2 budget=$3 tstall=$4 estall=$5 fused=$6
    shift 6
    local dir=$GCP_EXP_DIR/prediction/$exp
    if [ ! -d "$dir/weights/weights_ep$((epochs - 1))" ]; then
        # wall budget for the TRAIN phase: stop cleanly (rc 0) at the first
        # epoch boundary past it, so the eval below always gets a checkpoint
        # and the queue drains instead of being shot mid-train at the deadline
        local td=$(( $(date +%s) + budget ))
        if [ "$DEADLINE" != "0" ] && (( td > DEADLINE - estall - 300 )); then
            td=$(( DEADLINE - estall - 300 ))
        fi
        stage "$exp: training to $epochs epochs (fused_gn=$fused, deadline in $(( td - $(date +%s) ))s)"
        GCP_FUSED_GN=$fused $R "$dir/weights" "$tstall" 20 python -m $T \
            --path "experiments/prediction/$exp" --num_epochs "$epochs" \
            --train_deadline "$td"
    fi
    # achieved epoch = newest weights_epN on disk (ADVICE r4 #1)
    local achieved=-1 d n
    for d in "$dir"/weights/weights_ep*; do
        [ -d "$d" ] || continue
        n=${d##*weights_ep}
        case $n in *[!0-9]*) continue;; esac
        (( n > achieved )) && achieved=$n
    done
    if [ "$achieved" -lt 0 ]; then
        stage "$exp: no checkpoint at all — skipping eval"
        return 1
    fi
    if ! ls "$dir"/metrics/results_*.txt >/dev/null 2>&1; then
        stage "$exp: top-of-100 eval (stock lowering, achieved ep$achieved)"
        GCP_FUSED_GN=0 $R "$dir/metrics" "$estall" 4 python -m $T \
            --path "experiments/prediction/$exp" --metric 1 "$@"
    fi
    if ls "$dir"/metrics/results_*.txt >/dev/null 2>&1; then
        mkdir -p "experiments/prediction/$exp/results"
        local suffix=""
        if [ "$achieved" -lt $((epochs - 1)) ]; then
            suffix="_ep${achieved}_partial"
            stage "$exp: WARNING training stopped at ep$achieved/" \
                  "$((epochs - 1)) — results copied with suffix $suffix"
        fi
        for f in "$dir"/metrics/results_*.txt; do
            local b; b=$(basename "$f" .txt)
            cp -f "$f" "experiments/prediction/$exp/results/${b}${suffix}.txt"
        done
        python scripts/dump_scalar_trace.py "$dir/events" "" \
            "experiments/prediction/$exp/results/scalar_trace.csv" \
            2>/dev/null || stage "$exp: scalar trace dump failed"
    fi
}

control_20() { # <variant> — 20-task control run + score table
    local v=$1
    local log=experiments/control/9room/$v/log
    if [ ! -f "$log/scores_0to19.pkl" ] || [ ! -f "$log/results_0to19.txt" ]; then
        stage "control $v: 20 tasks"
        $R "$log" 1800 10 python -m "$RUN" \
            "experiments/control/9room/$v/mod_hyper.py" \
            --start_idx 0 --end_idx 19
        python -m video_gcp_tpu.evaluation.compute_control_perf \
            --path "$log/scores_0to19.pkl" \
            || stage "compute_control_perf failed for $v"
    fi
}

# Fused-GN lowering choice for TRAINING: stock. The two quiet-chip
# measurements disagree only through batch size — the clean A/B
# (fused_gn_train_ab_clean.json, bs=8) has fused 1.57x faster, while
# bench.py's train metric (bs=16, the size every real config trains at)
# has stock 1.37x faster (65.3k vs 47.5k f/s, logs/bench_smoke_r5.log,
# consistent with r03 history). Fused throughput is ~47k at BOTH sizes,
# i.e. the fused backward is batch-bound; at bs=16 stock wins, so real
# training runs stock. Eval stages were already stock (forward parity).

# --- 1. 25-room flagship (VERDICT ask #1, third round of asking) ---------
if [ -f "$GCP_DATA_DIR/nav_25rooms/traj_999.h5" ]; then
    fits 14400 && train_then_eval 25room/gcp_tree 75 10800 2400 2400 0
else
    stage "SKIP 25room flagship: dataset missing"
fi

# --- 2a. 9room gcp_tree retrain (control baseline; ckpts were wiped) -----
resume_datagen nav_9rooms 2000
if [ -f "$GCP_DATA_DIR/nav_9rooms/traj_1999.h5" ]; then
    fits 9000 && train_then_eval 9room/gcp_tree 75 5400 2400 1800 0
else
    stage "SKIP 9room gcp_tree: dataset incomplete"
fi

# --- 2b. wide-gap inverse-model fine-tune (intervention A) ---------------
BASE_CKPT=$GCP_EXP_DIR/prediction/9room/gcp_tree/weights/weights_ep74
WG_DIR=$GCP_EXP_DIR/prediction/9room/gcp_tree_widegap
if [ -d "$BASE_CKPT" ] && [ ! -d "$WG_DIR/weights/weights_ep9" ]; then
    if fits 2400; then
        stage "inv_mdl wide-gap fine-tune (10 epochs, head-only)"
        $R "$WG_DIR/weights" 1200 4 python scripts/finetune_inv_mdl.py \
            --path experiments/prediction/9room/gcp_tree_widegap \
            --base "$BASE_CKPT" --epochs 10
    fi
fi

# --- 2c. four 20-task control runs on the same task draw -----------------
if [ ! -d "$GCP_DATA_DIR/nav_9rooms/start_goal_configs/raw" ]; then
    stage "start/goal task configs"
    GCP_PLATFORM=cpu python -m "$RUN" \
        experiments/data_gen/nav_9rooms_start_goal/mod_hyper.py
fi
if [ -d "$BASE_CKPT" ]; then
    fits 2400 && control_20 gcp_tree_r5base
    [ -d "$WG_DIR/weights/weights_ep9" ] && fits 2400 && control_20 gcp_tree_widegap
    fits 2400 && control_20 gcp_tree_replan
    fits 2400 && control_20 gcp_tree_cursor
fi

# --- 5. adaptive-DLM de-confound (VERDICT ask #5, carried since r3) ------
if [ -f "$GCP_DATA_DIR/nav_9rooms/traj_1999.h5" ]; then
    fits 10800 && train_then_eval 9room/gcp_adaptive_dlm 75 5400 2400 1800 0
fi

# --- 7. T=500 tree full 30-epoch budget (checkpoint was wiped) -----------
# The T=500 dataset is generated lazily HERE (not in the launcher pre-pass):
# it is only needed by this deadline-gated stage, and pre-generating it would
# idle the chip ~25 min on the 1-core VM before the flagship could start.
if fits 12600; then
    resume_datagen nav_25rooms_long 400
    if [ -f "$GCP_DATA_DIR/nav_25rooms_long/traj_399.h5" ]; then
        train_then_eval 25room_long/gcp_tree 30 9000 2400 2400 0
    else
        stage "SKIP 25room_long tree: dataset incomplete"
    fi
fi

stage "queue5 complete"
