"""Paired A/B table over control variants that share one task draw.

Round-5 intervention analysis (VERDICT r4 ask #2): the four 20-task control
runs (r5base / widegap / replan / cursor) execute the SAME start/goal configs,
so per-task PAIRED comparison is valid and far tighter than comparing success
rates at n=20 (SEM ~0.1). For each variant this prints the aggregate metrics
(same math as evaluation/compute_control_perf.py) plus the per-task success
vector and final rooms-to-goal, and for each non-baseline variant the paired
task-level win/loss/tie counts against the baseline on rooms-to-goal (lower
is better; success flips listed explicitly).

Usage:
  python scripts/control_ab_table.py \
      --logs experiments/control/9room/gcp_tree_r5base/log \
             experiments/control/9room/gcp_tree_widegap/log ... \
      [--pkl scores_0to9.pkl scores_10to19.pkl ...] [--max_seq_len 200]

`--pkl` takes one or more chunk file names (resumable control runs write one
scores_{a}to{b}.pkl per index range); chunks are merged in task order. Only
chunks present in EVERY log dir are used, so the paired statistics always
compare identical task sets.
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_gcp_tpu.evaluation.compute_control_perf import (
    compute_control_perf, n_room_path,
)
from video_gcp_tpu.planning.infra.envs.layout import define_layout


def per_task(data, n_rooms, max_seq_len):
    layout = define_layout(int(np.sqrt(n_rooms)), None)
    succ, r2g = [], []
    for i in range(len(data["full_traj"])):
        goal = np.asarray(data["reset_state"][i]["goal"])[-2:]
        final = np.asarray(data["full_traj"][i][-1][:2], np.float64)
        goal_room = layout.coords2ridx(goal[0], goal[1])
        final_room = layout.coords2ridx(final[0], final[1])
        succ.append(final_room == goal_room)
        r2g.append(n_room_path(final_room, goal_room, layout))
    return np.asarray(succ), np.asarray(r2g)


def _chunk_start(name):
    # scores_{a}to{b}.pkl -> a (sort key for task-order concatenation)
    stem = os.path.basename(name).replace("scores_", "").split("to")[0]
    return int(stem)


def _load_merged(log, pkls):
    """Concatenate chunk pkls in task order (lists extend, arrays concat)."""
    merged = {}
    for pkl in sorted(pkls, key=_chunk_start):
        with open(os.path.join(log, pkl), "rb") as f:
            data = pickle.load(f)
        for k, v in data.items():
            if k not in merged:
                merged[k] = list(v)
            else:
                merged[k].extend(list(v))
    # lists suffice for every consumer here (per_task/compute_control_perf
    # index full_traj/reset_state element-wise)
    return merged


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logs", nargs="+", required=True)
    p.add_argument("--pkl", nargs="+", default=["scores_0to19.pkl"])
    p.add_argument("--n_rooms", default=9, type=int)
    p.add_argument("--max_seq_len", default=200, type=int)
    args = p.parse_args()

    # keep only chunks every log dir has: paired stats need identical tasks
    shared = [pkl for pkl in args.pkl
              if all(os.path.isfile(os.path.join(log, pkl))
                     for log in args.logs)]
    dropped = sorted(set(args.pkl) - set(shared))
    if dropped:
        print(f"(dropped chunks missing from some log dir: {dropped})")

    rows, tasks = [], {}
    for log in args.logs:
        name = os.path.basename(os.path.dirname(os.path.abspath(log)))
        data = _load_merged(log, shared)
        agg = compute_control_perf(data, n_rooms=args.n_rooms,
                                   max_seq_len=args.max_seq_len)
        succ, r2g = per_task(data, args.n_rooms, args.max_seq_len)
        rows.append((name, agg))
        tasks[name] = (succ, r2g)

    print("| variant | success | penalized cost | Room2Goal | RTravers |")
    print("|---|---|---|---|---|")
    for name, a in rows:
        print(f"| {name} | {a['success_rate']:.2f} "
              f"| {a['penalized_cost']:.1f} "
              f"| {a['rooms_to_goal_mean']:.2f}±{a['rooms_to_goal_std']:.2f} "
              f"| {a['rooms_traversed_mean']:.2f}"
              f"±{a['rooms_traversed_std']:.2f} |")

    base_name = rows[0][0]
    b_succ, b_r2g = tasks[base_name]
    print(f"\nper-task success vectors (task order = shared draw):")
    for name, _ in rows:
        s = tasks[name][0]
        print(f"  {name:24s} {''.join('#' if x else '.' for x in s)}")
    for name, _ in rows[1:]:
        s, r = tasks[name]
        n = min(len(s), len(b_succ))
        win = int(np.sum(r[:n] < b_r2g[:n]))
        loss = int(np.sum(r[:n] > b_r2g[:n]))
        tie = n - win - loss
        flips_up = int(np.sum(s[:n] & ~b_succ[:n]))
        flips_dn = int(np.sum(~s[:n] & b_succ[:n]))
        print(f"\n{name} vs {base_name} (paired, n={n}): rooms-to-goal "
              f"win/tie/loss = {win}/{tie}/{loss}; success flips "
              f"+{flips_up}/-{flips_dn}")


if __name__ == "__main__":
    main()
