#!/usr/bin/env bash
# Round-5e queue: scale up the winning control intervention (VERDICT r4
# ask #2: ">=20-task rerun each, 100-task for the winner").
#
# r5d's paired 10-task A/B picked widegap (success 0.4 vs base 0.2,
# rooms-to-goal wins 3/7/0). This session extends the SAME shared task draw
# to n=50 for both base and widegap — a 50-task paired comparison of winner
# vs baseline is statistically tighter than an unpaired 100-task single run
# and is what the budget affords (~11 min per 10-task chunk, measured r5d).
# Chunks alternate base/widegap so any deadline cut leaves balanced pairs.
# Also: the combined widegap+cursor variant (do the two interventions
# compose?) on the same draw, and the top-of-100 prediction eval of the
# shared ep46 predictor that r5d's deadline shed.
#
# Chip handoff protocol (PARITY.md round 5): launch under setsid; \
# driver_watch2.sh kills the whole group when driver bench activity appears;
# every stage is QUEUE_DEADLINE-gated so the queue drains early.
set -uo pipefail
export GCP_DATA_DIR=${GCP_DATA_DIR:-/root/data}
export GCP_EXP_DIR=${GCP_EXP_DIR:-/root/exp}
cd "$(dirname "$0")/.."
R=scripts/run_resilient.sh
T=video_gcp_tpu.training.train
RUN=video_gcp_tpu.planning.run
DEADLINE=${QUEUE_DEADLINE:?r5e requires QUEUE_DEADLINE}

stage() { echo "[queue5e $(date +%H:%M:%S)] $*" >&2; }
left() { echo $(( DEADLINE - $(date +%s) )); }
fits() {
    if (( $(date +%s) + $1 > DEADLINE )); then
        stage "SKIP (deadline): stage budget $1s does not fit ($(left)s left)"
        return 1
    fi
    return 0
}

CHUNKS="0to9 10to19 20to29 30to39 40to49"

control_chunk() { # <variant> <start> <end>
    local v=$1 a=$2 b=$3
    local log=experiments/control/9room/$v/log
    if [ ! -f "$log/scores_${a}to${b}.pkl" ]; then
        stage "control $v: tasks $a-$b ($(left)s left)"
        $R "$log" 1800 10 python -m "$RUN" \
            "experiments/control/9room/$v/mod_hyper.py" \
            --start_idx "$a" --end_idx "$b"
    fi
}

make_tables() { # regenerate after every chunk so an artifact always exists
    local out=experiments/control/9room/control_ab_r5e.txt
    local pkls=()
    for c in $CHUNKS; do pkls+=("scores_${c}.pkl"); done
    {
        echo "== base vs widegap, all paired chunks available =="
        python scripts/control_ab_table.py --pkl "${pkls[@]}" --logs \
            experiments/control/9room/gcp_tree_r5base/log \
            experiments/control/9room/gcp_tree_widegap/log
        echo
        echo "== 3-way incl. combined widegap+cursor (BEYOND REFERENCE) =="
        python scripts/control_ab_table.py --pkl "${pkls[@]}" --logs \
            experiments/control/9room/gcp_tree_r5base/log \
            experiments/control/9room/gcp_tree_widegap/log \
            experiments/control/9room/gcp_tree_wgcursor/log \
            2>/dev/null || echo "(no shared chunks for wgcursor yet)"
    } > "$out" 2>&1 || stage "control_ab_table failed"
}

# --- paired chunks 10-29, alternating so cuts leave balanced pairs --------
for c in 10:19 20:29; do
    a=${c%:*}; b=${c#*:}
    fits 800 && control_chunk gcp_tree_widegap "$a" "$b"
    fits 800 && control_chunk gcp_tree_r5base "$a" "$b"
    make_tables
done

# --- combined intervention on the r5d draw (composition test) -------------
fits 800 && control_chunk gcp_tree_wgcursor 0 9 && make_tables

# --- paired chunks 30-49 --------------------------------------------------
for c in 30:39 40:49; do
    a=${c%:*}; b=${c#*:}
    fits 800 && control_chunk gcp_tree_widegap "$a" "$b"
    fits 800 && control_chunk gcp_tree_r5base "$a" "$b"
    make_tables
done

# --- top-of-100 prediction eval for the shared ep46 predictor (r5d shed) --
TREE_DIR=$GCP_EXP_DIR/prediction/9room/gcp_tree
if ! ls "$TREE_DIR"/metrics/results_*.txt >/dev/null 2>&1 && fits 1500; then
    ACH=$(ls "$TREE_DIR/weights" | sed -n 's/^weights_ep\([0-9]*\)$/\1/p' \
          | sort -n | tail -1)
    stage "9room/gcp_tree: top-of-100 eval (ep$ACH)"
    GCP_FUSED_GN=0 $R "$TREE_DIR/metrics" 1500 4 python -m $T \
        --path experiments/prediction/9room/gcp_tree --metric 1
    if ls "$TREE_DIR"/metrics/results_*.txt >/dev/null 2>&1; then
        mkdir -p experiments/prediction/9room/gcp_tree/results_r5
        suffix=""
        [ "$ACH" -lt 74 ] && suffix="_ep${ACH}_partial"
        for f in "$TREE_DIR"/metrics/results_*.txt; do
            bn=$(basename "$f" .txt)
            cp -f "$f" "experiments/prediction/9room/gcp_tree/results_r5/${bn}${suffix}.txt"
        done
        python scripts/dump_scalar_trace.py "$TREE_DIR/events" "" \
            experiments/prediction/9room/gcp_tree/results_r5/scalar_trace.csv \
            2>/dev/null || stage "scalar trace dump failed"
    fi
fi

# --- stretch: extend the combined variant ---------------------------------
fits 800 && control_chunk gcp_tree_wgcursor 10 19 && make_tables

stage "queue5e complete ($(left)s before deadline)"
