"""nav_9rooms dataset config (reference: gcp/datasets/configs/nav_9rooms.py).

Images are re-rendered top-down from (x, y) states through the same renderer
the control-time env uses (MazeTopRenderedGlobalSplitVarLenVideoDataset).
"""
import numbers

import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.data.datasets import (
    MazeTopRenderedGlobalSplitVarLenVideoDataset,
)


class Nav9Rooms(MazeTopRenderedGlobalSplitVarLenVideoDataset):
    n_rooms = 9

    @classmethod
    def render_trajectory(cls, outputs, inputs, predictions, end_inds,
                          n_logged_samples=3):
        """Top-down trajectory rendering hook for logging; requires the
        planning-infra layout renderer (nav_9rooms.py:10-53)."""
        from video_gcp_tpu.planning.infra.envs.layout import (
            render_state_trajectories,
        )

        return {
            "image": render_state_trajectories(
                cls.n_rooms, inputs, predictions, end_inds, n_logged_samples
            )
        }


config = AttrDict(
    dataset_spec=AttrDict(
        max_seq_len=100,
        dataset_class=Nav9Rooms,
        split=AttrDict(train=0.994, val=0.006, test=0.00),
        # published nav dataset dims (the reference ships these in the
        # dataset's dataset_spec.py, merged into the model config at
        # gcp_builder.py:67-68): (x, y) planar state, (dx, dy) action
        state_dim=2,
        n_actions=2,
    ),
    n_rooms=9,
    crop_window=40,
)
