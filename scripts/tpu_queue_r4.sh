#!/usr/bin/env bash
# Round-4 TPU queue (run after tpu_queue_r3c.sh drains; pass WAIT_PID to
# serialize). Attacks the quality gap identified by the round-3 ep74-vs-ep199
# ablation (PARITY.md): quality is data-bound at 2k trajectories, so train at
# reference data scale.
#   0. wait for the 12k-trajectory datagen to finish (CPU job started in
#      round 3: indices 2000..11999 into nav_9rooms; per-file resumable —
#      restart with scripts/reproduce_parity.sh stage-1 logic if dead)
#   1. gcp_tree_12k: fresh 9-room training on all 12k trajectories,
#      100 epochs (GlobalSplit re-slices automatically)
#   2. top-of-100 eval
#   3. 20-task closed-loop control benchmark with the 12k checkpoint
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
R=scripts/run_resilient.sh
T=video_gcp_tpu.training.train

if [ -n "${WAIT_PID:-}" ]; then
    echo "[queue4] waiting for pid $WAIT_PID" >&2
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

stage() { echo "[queue4 $(date +%H:%M:%S)] $*" >&2; }

N_TRAJS=12000
FIRST_MISSING=0
while [ "$FIRST_MISSING" -lt "$N_TRAJS" ] \
        && [ -f "$GCP_DATA_DIR/nav_9rooms/traj_${FIRST_MISSING}.h5" ]; do
    FIRST_MISSING=$((FIRST_MISSING + 1))
done
if [ "$FIRST_MISSING" -lt "$N_TRAJS" ]; then
    stage "datagen incomplete at traj_$FIRST_MISSING — resuming (CPU)"
    JAX_PLATFORMS=cpu nice -n 19 python -m video_gcp_tpu.planning.run \
        experiments/data_gen/nav_9rooms/mod_hyper.py \
        --start_idx "$FIRST_MISSING" --end_idx $((N_TRAJS - 1))
fi

BIG=$GCP_EXP_DIR/prediction/9room/gcp_tree_12k
CTRL_LOG=experiments/control/9room/gcp_tree_12k/log

# 12k trajs -> ~11,880 train files -> 742 iters/epoch at batch 16 with
# epoch_cycles_train=2 -> 100 epochs is ~3x the ep74 step budget on 6x data
if [ ! -d "$BIG/weights/weights_ep99" ]; then
    stage "gcp_tree_12k: 100-epoch training on 12k trajectories"
    $R "$BIG/weights" 2400 20 python -m $T \
        --path experiments/prediction/9room/gcp_tree_12k --num_epochs 100
fi

if ! ls "$BIG"/metrics/results_*.txt >/dev/null 2>&1; then
    stage "gcp_tree_12k top-of-100 eval"
    $R "$BIG/metrics" 1200 4 python -m $T \
        --path experiments/prediction/9room/gcp_tree_12k --metric 1
fi

if [ ! -d "$GCP_DATA_DIR/nav_9rooms/start_goal_configs/raw" ]; then
    stage "generating start/goal benchmark configs (CPU)"
    JAX_PLATFORMS=cpu python -m video_gcp_tpu.planning.run \
        experiments/data_gen/nav_9rooms_start_goal/mod_hyper.py
fi

if [ ! -f "$CTRL_LOG/scores_0to19.pkl" ]; then
    stage "20-task control benchmark with the 12k checkpoint"
    $R "$CTRL_LOG" 1800 10 python -m video_gcp_tpu.planning.run \
        experiments/control/9room/gcp_tree_12k/mod_hyper.py \
        --start_idx 0 --end_idx 19
    python -m video_gcp_tpu.evaluation.compute_control_perf \
        --path "$CTRL_LOG/scores_0to19.pkl" \
        || stage "compute_control_perf failed"
fi

# 4./5. the round-3 three-way table's quality leader (adaptive soft-DTW
# binding) at the same 12k data scale + its top-of-100 eval
ADA=$GCP_EXP_DIR/prediction/9room/gcp_adaptive_12k
if [ ! -d "$ADA/weights/weights_ep99" ]; then
    stage "gcp_adaptive_12k: 100-epoch training on 12k trajectories"
    $R "$ADA/weights" 2400 20 python -m $T \
        --path experiments/prediction/9room/gcp_adaptive_12k --num_epochs 100
fi
if ! ls "$ADA"/metrics/results_*.txt >/dev/null 2>&1; then
    stage "gcp_adaptive_12k top-of-100 eval"
    $R "$ADA/metrics" 1200 4 python -m $T \
        --path experiments/prediction/9room/gcp_adaptive_12k --metric 1
fi

stage "queue4 complete"
