"""TensorBoard logging (scalars / images / gifs / graphs).

Covers the reference Logger surface (gcp/prediction/utils/logger.py:15-100):
scalars, image grids, video/gif strips, 1-D graphs — via
torch.utils.tensorboard (CPU-only use of torch). The HierarchyLogger tree
visualizations (hierarchy split images, match overviews, pruned trees,
logger.py:103-345) are produced by video_gcp_tpu.evaluation.visualization and
routed through `log_image`/`log_video` here.
"""
from __future__ import annotations

import os

import numpy as np


class Logger:
    def __init__(self, log_dir: str, flush_secs: int = 1):
        from torch.utils.tensorboard import SummaryWriter

        os.makedirs(log_dir, exist_ok=True)
        self._log_dir = log_dir
        self.writer = SummaryWriter(log_dir, flush_secs=flush_secs)

    def _tag(self, name, phase):
        return f"{phase}_{name}"

    def log_scalar(self, value, name, step, phase=""):
        self.writer.add_scalar(self._tag(name, phase), float(value), step)

    def log_scalar_dict(self, d, step, phase=""):
        for k, v in d.items():
            try:
                self.log_scalar(float(v), k, step, phase)
            except (TypeError, ValueError):
                pass

    def log_images(self, images, name, step, phase=""):
        """[N, H, W, C] float in [-1, 1] -> image grid."""
        images = np.asarray(images)
        images = np.clip((images + 1.0) / 2.0, 0, 1)
        n, h, w, c = images.shape
        grid = images.transpose(1, 0, 2, 3).reshape(h, n * w, c)
        self.writer.add_image(self._tag(name, phase), grid, step,
                              dataformats="HWC")

    def log_video(self, frames, name, step, phase="", fps=4):
        """[T, H, W, C] float in [-1, 1]. Falls back to an image strip when
        video encoding (moviepy) is unavailable."""
        import importlib.util

        frames = np.asarray(frames)
        if importlib.util.find_spec("moviepy") is not None:
            import torch

            clipped = np.clip((frames + 1.0) / 2.0, 0, 1)
            vid = torch.from_numpy(
                (clipped * 255).astype(np.uint8).transpose(0, 3, 1, 2)[None]
            )
            self.writer.add_video(self._tag(name, phase), vid, step, fps=fps)
        else:
            step_sz = max(len(frames) // 10, 1)
            self.log_images(frames[::step_sz][:10], name + "_strip", step, phase)

    def log_graph(self, values, name, step, phase=""):
        """1-D array as a per-index scalar family (layerwise losses,
        tree_module.py:159-169)."""
        values = np.asarray(values)
        for i, v in enumerate(values.ravel()):
            if np.isfinite(v):
                self.writer.add_scalar(
                    f"{self._tag(name, phase)}/{i}", float(v), step
                )

    def flush(self):
        self.writer.flush()
