"""TensorBoard logging (scalars / images / gifs / graphs) — torch-free.

Covers the reference Logger surface (gcp/prediction/utils/logger.py:15-100):
scalars, image grids, video strips, 1-D graphs — written directly with the
pure-python `tensorboard` event writer + summary protos (no torch, no
moviepy: videos are logged as animated GIFs, which TensorBoard renders in
the image tab). The HierarchyLogger tree visualizations (hierarchy split
images, match overviews, pruned trees, logger.py:103-345) are produced by
video_gcp_tpu.evaluation.visualization and routed through
`log_image`/`log_video` here.
"""
from __future__ import annotations

import io
import os

import numpy as np


def _to_uint8(images: np.ndarray) -> np.ndarray:
    """float [-1, 1] -> uint8 [0, 255]."""
    return (np.clip((np.asarray(images) + 1.0) / 2.0, 0, 1) * 255).astype(
        np.uint8
    )


def _encode_png(img_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, format="PNG")
    return buf.getvalue()


def _encode_gif(frames_u8: np.ndarray, fps: int) -> bytes:
    from PIL import Image

    ims = [Image.fromarray(f) for f in frames_u8]
    buf = io.BytesIO()
    ims[0].save(
        buf, format="GIF", save_all=True, append_images=ims[1:],
        duration=max(int(1000 / max(fps, 1)), 20), loop=0,
    )
    return buf.getvalue()


class Logger:
    def __init__(self, log_dir: str, flush_secs: int = 1):
        from tensorboard.summary.writer.event_file_writer import (
            EventFileWriter,
        )

        os.makedirs(log_dir, exist_ok=True)
        self._log_dir = log_dir
        self._writer = EventFileWriter(log_dir, flush_secs=flush_secs)

    # -- low-level ---------------------------------------------------------

    def _add_summary(self, values, step):
        from tensorboard.compat.proto.event_pb2 import Event
        from tensorboard.compat.proto.summary_pb2 import Summary

        event = Event(summary=Summary(value=values))
        event.step = int(step)
        self._writer.add_event(event)

    def _tag(self, name, phase):
        return f"{phase}_{name}"

    # -- public surface (parity with ref logger.py:15-100) ------------------

    def log_scalar(self, value, name, step, phase=""):
        from tensorboard.compat.proto.summary_pb2 import Summary

        self._add_summary(
            [Summary.Value(tag=self._tag(name, phase),
                           simple_value=float(value))], step,
        )

    def log_scalar_dict(self, d, step, phase=""):
        for k, v in d.items():
            try:
                self.log_scalar(float(v), k, step, phase)
            except (TypeError, ValueError):
                pass

    def _log_encoded_image(self, png, h, w, c, name, step, phase=""):
        from tensorboard.compat.proto.summary_pb2 import Summary

        img = Summary.Image(
            height=h, width=w, colorspace=c, encoded_image_string=png
        )
        self._add_summary(
            [Summary.Value(tag=self._tag(name, phase), image=img)], step
        )

    def log_images(self, images, name, step, phase=""):
        """[N, H, W, C] float in [-1, 1] -> horizontally tiled image grid."""
        images = _to_uint8(images)
        n, h, w, c = images.shape
        grid = images.transpose(1, 0, 2, 3).reshape(h, n * w, c)
        self._log_encoded_image(
            _encode_png(grid), h, n * w, c, name, step, phase
        )

    def log_video(self, frames, name, step, phase="", fps=4):
        """[T, H, W, C] float in [-1, 1], logged as an animated GIF summary."""
        frames = _to_uint8(frames)
        t, h, w, c = frames.shape
        self._log_encoded_image(
            _encode_gif(frames, fps), h, w, c, name, step, phase
        )

    def log_graph(self, values, name, step, phase=""):
        """1-D array as a per-index scalar family (layerwise losses,
        tree_module.py:159-169)."""
        from tensorboard.compat.proto.summary_pb2 import Summary

        values = np.asarray(values)
        summaries = [
            Summary.Value(tag=f"{self._tag(name, phase)}/{i}",
                          simple_value=float(v))
            for i, v in enumerate(values.ravel()) if np.isfinite(v)
        ]
        if summaries:
            self._add_summary(summaries, step)

    def flush(self):
        self._writer.flush()
