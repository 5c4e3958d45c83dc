"""Tree/hierarchy visualizations for TensorBoard logging.

Rebuilds the HierarchyLogger plot family (gcp/prediction/utils/
visualization.py:232-501 + utils/logger.py:103-345): balanced-tree image
pyramids, GT-match overviews, pruned-sequence strips. All functions return
float images in [-1, 1] (HWC) ready for training.logger.Logger.log_images.
"""
from __future__ import annotations

import math

import numpy as np


def _to01(x):
    return np.clip((np.asarray(x) + 1.0) / 2.0, 0.0, 1.0)


def plot_balanced_tree(images_bf: np.ndarray, i_ex: int = 0) -> np.ndarray:
    """Render one example's tree as an image pyramid: level d centered in row d
    (visualization.plot_balanced_tree:232)."""
    imgs = _to01(images_bf[i_ex])  # [N, H, W, C]
    n, h, w, c = imgs.shape
    depth = int(math.log2(n + 1))
    n_leaves = 2 ** (depth - 1)
    canvas = np.ones((depth * h, n_leaves * w, c), dtype=np.float32)
    idx = 0
    for d in range(depth):
        n_nodes = 2 ** d
        stride = n_leaves // n_nodes
        for k in range(n_nodes):
            cx = (k * stride + stride // 2) * w - (w // 2 if stride > 1 else 0)
            cx = max(min(cx, (n_leaves - 1) * w), 0)
            canvas[d * h : (d + 1) * h, cx : cx + w] = imgs[idx]
            idx += 1
    return canvas * 2.0 - 1.0


def plot_gt_matching_overview(images_bf: np.ndarray, match_dists: np.ndarray,
                              traj_seq: np.ndarray, i_ex: int = 0
                              ) -> np.ndarray:
    """GT frame strip on top, the matched node's frame below each
    (logger.log_gt_match_overview / visualization.plot_gt_matching_overview).
    """
    gt = _to01(traj_seq[i_ex])  # [T, H, W, C]
    imgs = _to01(images_bf[i_ex])  # [N, H, W, C]
    idx = np.argmax(np.asarray(match_dists[i_ex]), axis=0)  # [T] node per frame
    matched = imgs[idx]
    t, h, w, c = gt.shape
    top = gt.transpose(1, 0, 2, 3).reshape(h, t * w, c)
    bottom = matched.transpose(1, 0, 2, 3).reshape(h, t * w, c)
    return np.concatenate([top, bottom], axis=0) * 2.0 - 1.0


def plot_pruned_seq(images_df: np.ndarray, keep_mask: np.ndarray,
                    i_ex: int = 0) -> np.ndarray:
    """Strip of the kept (unpruned) frames in temporal order; pruned slots
    grayed out (logger.log_pruned_pred)."""
    imgs = _to01(images_df[i_ex])
    keep = np.asarray(keep_mask[i_ex]).astype(bool)
    shown = imgs.copy()
    shown[~keep] = shown[~keep] * 0.2 + 0.4  # gray out pruned nodes
    n, h, w, c = shown.shape
    return shown.transpose(1, 0, 2, 3).reshape(h, n * w, c) * 2.0 - 1.0


def seq_strip(images: np.ndarray, i_ex: int = 0, max_frames: int = 20
              ) -> np.ndarray:
    """Plain [T, H, W, C] -> horizontal strip (subsampled)."""
    imgs = _to01(images[i_ex])
    t = imgs.shape[0]
    step = max(t // max_frames, 1)
    imgs = imgs[::step][:max_frames]
    n, h, w, c = imgs.shape
    return imgs.transpose(1, 0, 2, 3).reshape(h, n * w, c) * 2.0 - 1.0
