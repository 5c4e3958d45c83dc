#!/usr/bin/env bash
# Round-3 TPU work queue: serialize all remaining single-chip hardware jobs
# (CLAUDE.md rule: never two TPU jobs at once). Each stage is resumable and
# stall-guarded by run_resilient.sh; rerunning this script skips completed
# stages via their output artifacts.
#
#   1. gcp_sequential top-of-100 eval        (3-way parity table row 2)
#   2. gcp_adaptive 75-epoch training        (soft-DTW f32 over a real run)
#   3. gcp_adaptive top-of-100 eval          (3-way parity table row 3)
#   4. 25room_long (T=500, L=9) training     (long-horizon capability)
#   5. 25room_long top-of-100 eval + horizon sweep
#
# Usage: WAIT_PID=<pid> scripts/tpu_queue_r3.sh   (waits for a running job)
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
R=scripts/run_resilient.sh
T=video_gcp_tpu.training.train

if [ -n "${WAIT_PID:-}" ]; then
    echo "[queue] waiting for pid $WAIT_PID" >&2
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

stage() { echo "[queue $(date +%H:%M:%S)] $*" >&2; }

SEQ=$GCP_EXP_DIR/prediction/9room/gcp_sequential
ADA=$GCP_EXP_DIR/prediction/9room/gcp_adaptive
LNG=$GCP_EXP_DIR/prediction/25room_long/gcp_tree

if ! ls "$SEQ"/metrics/results_*.txt >/dev/null 2>&1; then
    stage "sequential top-of-100 eval"
    $R "$SEQ/metrics" 1200 4 python -m $T \
        --path experiments/prediction/9room/gcp_sequential --metric 1
fi

if [ ! -d "$ADA/weights/weights_ep74" ]; then
    stage "adaptive 75-epoch training"
    $R "$ADA/weights" 1200 10 python -m $T \
        --path experiments/prediction/9room/gcp_adaptive --num_epochs 75
fi

if ! ls "$ADA"/metrics/results_*.txt >/dev/null 2>&1; then
    stage "adaptive top-of-100 eval"
    $R "$ADA/metrics" 1200 4 python -m $T \
        --path experiments/prediction/9room/gcp_adaptive --metric 1
fi

if [ ! -d "$LNG/weights/weights_ep29" ]; then
    stage "25room_long (T=500 L=9) 30-epoch training"
    $R "$LNG/weights" 2400 10 python -m $T \
        --path experiments/prediction/25room_long/gcp_tree --num_epochs 30
fi

if ! ls "$LNG"/metrics/results_*.txt >/dev/null 2>&1; then
    stage "25room_long top-of-100 eval"
    $R "$LNG/metrics" 2400 4 python -m $T \
        --path experiments/prediction/25room_long/gcp_tree --metric 1
fi

if [ ! -f "$LNG/dataset_sweep.txt" ]; then
    stage "25room_long dataset val sweep (T=100 vs T=500)"
    $R "$LNG" 2400 2 python -m $T \
        --path experiments/prediction/25room_long/gcp_tree --dataset_val_sweep 1 \
        > "$LNG/dataset_sweep.txt" 2>&1 || rm -f "$LNG/dataset_sweep.txt"
fi

stage "queue complete"
