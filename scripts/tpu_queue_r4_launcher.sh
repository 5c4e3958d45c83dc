#!/usr/bin/env bash
# Launches tpu_queue_r4.sh without colliding with the driver's end-of-round
# bench run (single chip — concurrent TPU jobs corrupt timings, CLAUDE.md):
#   1. wait for the 12k nav_9rooms datagen to finish (CPU job; per-file
#      resumable — tpu_queue_r4.sh re-resumes it if it died)
#   2. wait until the driver has recorded BENCH_r03.json (end-of-round bench
#      on the real chip), or give up waiting after MAX_WAIT_S
#   3. run the round-4 queue (12k training -> eval -> control -> adaptive)
set -uo pipefail
cd "$(dirname "$0")/.."

MAX_WAIT_S=${MAX_WAIT_S:-14400}
DATAGEN_PID=${DATAGEN_PID:-}

say() { echo "[launcher $(date +%H:%M:%S)] $*" >&2; }

if [ -n "$DATAGEN_PID" ]; then
    say "waiting for datagen pid $DATAGEN_PID"
    while kill -0 "$DATAGEN_PID" 2>/dev/null; do sleep 60; done
fi

say "waiting for BENCH_r03.json (driver bench) up to ${MAX_WAIT_S}s"
waited=0
while [ ! -f BENCH_r03.json ] && [ "$waited" -lt "$MAX_WAIT_S" ]; do
    sleep 60; waited=$((waited + 60))
done
[ -f BENCH_r03.json ] && sleep 120  # grace for any driver follow-up jobs

say "starting tpu_queue_r4.sh"
exec bash scripts/tpu_queue_r4.sh
