#!/usr/bin/env bash
# One-shot round-4 switchover: the live gcp_tree_12k trainer was launched with
# --num_epochs 100, but the round boundary only leaves time for 70 epochs plus
# the top-of-100 eval and the control benchmarks. Wait for weights_ep69 (orbax
# finalizes checkpoints with an atomic rename, so presence == complete), stop
# the old queue by exact pid, and relaunch the edited queue, whose stage 2 now
# targets 70 epochs and therefore skips straight to eval + control.
set -uo pipefail
cd "$(dirname "$0")/.."

QUEUE_PID=$1 RUNNER_PID=$2
CKPT=/root/exp/prediction/9room/gcp_tree_12k/weights/weights_ep69

while [ ! -d "$CKPT" ]; do sleep 60; done
echo "[switchover $(date +%H:%M:%S)] weights_ep69 present — stopping old queue" >&2

TRAINER_PID=$(pgrep -P "$RUNNER_PID" | head -1)
kill "$QUEUE_PID" 2>/dev/null
kill "$RUNNER_PID" 2>/dev/null
[ -n "${TRAINER_PID:-}" ] && kill "$TRAINER_PID" 2>/dev/null
sleep 15
[ -n "${TRAINER_PID:-}" ] && kill -9 "$TRAINER_PID" 2>/dev/null
sleep 10

echo "[switchover $(date +%H:%M:%S)] relaunching queue_r4b (stage 2 -> eval)" >&2
bash scripts/tpu_queue_r4b.sh >> logs/queue_r4b.log 2>&1 &
echo $! > /tmp/queue_r4b.pid
wait
