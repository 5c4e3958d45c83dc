"""Dump a scalar's full training trace from a TB event file to CSV.

Used to commit evidence traces (e.g. the adaptive matcher's
soft_dtw_stability_gap over a real run — the reference runs the same check as
a hard f64 assert at probabilistic_dtw.py:118-120; here it is a logged f32
drift diagnostic).

Usage: python scripts/dump_scalar_trace.py <events_dir> <tag_substring> [out.csv]
"""
import sys

from tensorboard.backend.event_processing import event_accumulator


def main():
    events_dir, needle = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else None
    acc = event_accumulator.EventAccumulator(
        events_dir, size_guidance={event_accumulator.SCALARS: 0}
    )
    acc.Reload()
    tags = [t for t in acc.Tags()["scalars"] if needle in t]
    if not tags:
        sys.exit(f"no scalar tag containing {needle!r}; have: "
                 f"{acc.Tags()['scalars']}")
    lines = ["tag,step,value"]
    for t in tags:
        for ev in acc.Scalars(t):
            lines.append(f"{t},{ev.step},{ev.value:.6g}")
    text = "\n".join(lines) + "\n"
    if out:
        with open(out, "w") as f:
            f.write(text)
        vals = [float(l.rsplit(",", 1)[1]) for l in lines[1:]]
        print(f"{len(vals)} points -> {out}; min {min(vals):.3g} "
              f"max {max(vals):.3g} last {vals[-1]:.3g}")
    else:
        print(text)


if __name__ == "__main__":
    main()
