"""Unit tests for scripts/control_ab_table.py chunk merging.

The r5e control queue extends paired runs chunk-by-chunk
(scores_{a}to{b}.pkl per index range); the table script must concatenate
chunks in task order and must only use chunks present in every compared log
dir so paired statistics always cover identical task sets.
"""
import importlib.util
import os
import pickle

import numpy as np
import pytest

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts", "control_ab_table.py")


@pytest.fixture(scope="module")
def tab():
    spec = importlib.util.spec_from_file_location("control_ab_table", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _chunk(tag, n=2):
    # minimal scores dict shape: list-valued keys indexed per task
    return {
        "full_traj": [np.full((3, 2), float(tag * 10 + i)) for i in range(n)],
        "reset_state": [{"goal": np.array([tag, i])} for i in range(n)],
    }


def test_chunk_start_parses_index(tab):
    assert tab._chunk_start("scores_0to9.pkl") == 0
    assert tab._chunk_start("scores_40to49.pkl") == 40
    assert tab._chunk_start("/some/dir/scores_10to19.pkl") == 10


def test_load_merged_concatenates_in_task_order(tab, tmp_path):
    # write chunks out of order; merge must sort by start index
    for name, tag in [("scores_10to19.pkl", 1), ("scores_0to9.pkl", 0)]:
        with open(tmp_path / name, "wb") as f:
            pickle.dump(_chunk(tag), f)
    merged = tab._load_merged(str(tmp_path),
                              ["scores_10to19.pkl", "scores_0to9.pkl"])
    assert len(merged["full_traj"]) == 4
    # task order: chunk 0 tasks first, then chunk 10
    firsts = [t[0, 0] for t in merged["full_traj"]]
    assert firsts == [0.0, 1.0, 10.0, 11.0]
    assert [r["goal"][0] for r in merged["reset_state"]] == [0, 0, 1, 1]
