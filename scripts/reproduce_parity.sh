#!/usr/bin/env bash
# End-to-end quality-parity protocol for the 9-room nav benchmark.
#
# Reproduces the numbers reported in PARITY.md ("Validated end-to-end on
# hardware"): PRM-expert data generation, GCP-tree training, top-of-100
# PSNR/SSIM/MSE evaluation (reference protocol:
# gcp/evaluation/compute_metrics.py:119-141), and the closed-loop control
# benchmark. Runs self-contained — no external downloads.
#
# Usage:
#   GCP_DATA_DIR=/root/data GCP_EXP_DIR=/root/exp \
#       scripts/reproduce_parity.sh [n_train_trajs] [n_control_tasks]
#
# Stages are skipped when their outputs already exist, so the script is
# resumable; delete the corresponding directory to force a rerun.
set -euo pipefail

export GCP_DATA_DIR=${GCP_DATA_DIR:-/tmp/gcp_data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/tmp/gcp_exp}
N_TRAJS=${1:-2000}
N_TASKS=${2:-20}

cd "$(dirname "$0")/.."

# 1. expert demonstrations (PRM policy in the top-down multiroom maze).
#    CPU-only; ~4 trajs/s/core. Resumable: restarts at the first missing
#    trajectory index instead of regenerating from 0.
FIRST_MISSING=0
while [ "$FIRST_MISSING" -lt "$N_TRAJS" ] \
        && [ -f "$GCP_DATA_DIR/nav_9rooms/traj_${FIRST_MISSING}.h5" ]; do
    FIRST_MISSING=$((FIRST_MISSING + 1))
done
if [ "$FIRST_MISSING" -lt "$N_TRAJS" ]; then
    JAX_PLATFORMS=cpu python -m video_gcp_tpu.planning.run \
        experiments/data_gen/nav_9rooms/mod_hyper.py \
        --start_idx "$FIRST_MISSING" --end_idx $((N_TRAJS - 1))
fi
printf 'dataset_spec = dict(max_seq_len=100, state_dim=2, n_actions=2)\n' \
    > "$GCP_DATA_DIR/nav_9rooms/dataset_spec.py"

# 2. benchmark start/goal configurations (raw format, 100 tasks)
if [ ! -d "$GCP_DATA_DIR/nav_9rooms/start_goal_configs/raw" ]; then
    JAX_PLATFORMS=cpu python -m video_gcp_tpu.planning.run \
        experiments/data_gen/nav_9rooms_start_goal/mod_hyper.py
fi

# 3. train the hierarchical predictor at published 9-room hparams
#    (experiments/prediction/9room/gcp_tree/conf.py). Resumable: picks up
#    from the latest epoch checkpoint. Interrupt at any epoch boundary.
python -m video_gcp_tpu.training.train \
    --path experiments/prediction/9room/gcp_tree

# 4. top-of-100 metrics + per-sequence dumps on the val split
python -m video_gcp_tpu.training.train \
    --path experiments/prediction/9room/gcp_tree --metric 1

# 5. FVD / LPIPS over the dumped sequences (proxy embeddings unless
#    GCP_I3D_CKPT / GCP_LPIPS_CKPT point at real weights)
python -m video_gcp_tpu.evaluation.fvd \
    "$GCP_EXP_DIR/prediction/9room/gcp_tree/metrics" \
    || echo "WARNING: FVD stage failed — FVD omitted from the report" >&2
python -m video_gcp_tpu.evaluation.lpips \
    "$GCP_EXP_DIR/prediction/9room/gcp_tree/metrics" \
    || echo "WARNING: LPIPS stage failed — LPIPS omitted from the report" >&2

# 6. closed-loop control benchmark (hierarchical image CEM with the learned
#    cost + inverse-model closed-loop execution) on the first N_TASKS tasks
python -m video_gcp_tpu.planning.run \
    experiments/control/9room/gcp_tree/mod_hyper.py \
    --start_idx 0 --end_idx $((N_TASKS - 1))
python -m video_gcp_tpu.evaluation.compute_control_perf \
    --path experiments/control/9room/gcp_tree/log/scores_0to$((N_TASKS - 1)).pkl
