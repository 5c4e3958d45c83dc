"""Perceptual distance over dumped sequences (LPIPS protocol).

Reference: gcp/evaluation/lpips/compute_lpips.py:18-62 (AlexNet perceptual
loss over gen_images/gt_seq .npy dumps). This environment ships no
torchvision/pretrained weights and has no egress, so the default feature stack
is a fixed-seed random conv pyramid with per-layer unit-normalized feature
distances — the LPIPS computation graph with untrained features (a documented,
reproducible proxy; pass `feature_fn` to plug real AlexNet features).

CLI: python -m video_gcp_tpu.evaluation.lpips <metrics_dir> [--it N]
"""
from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np


def _random_features(x: jnp.ndarray, seed: int = 0):
    """Random conv pyramid features, one output per layer.
    :param x: [N, H, W, C] in [-1, 1]."""
    key = jax.random.PRNGKey(seed)
    feats = []
    h = x
    ch = x.shape[-1]
    for out_ch in [32, 64, 128]:
        key, k = jax.random.split(key)
        w = jax.random.normal(k, (3, 3, ch, out_ch)) / np.sqrt(9 * ch)
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h = jax.nn.relu(h)
        feats.append(h)
        ch = out_ch
    return feats


def lpips_distance(a: np.ndarray, b: np.ndarray, feature_fn=None) -> np.ndarray:
    """Per-image perceptual distance. a, b: [N, H, W, C] in [-1, 1]."""
    fa = (feature_fn or _random_features)(jnp.asarray(a))
    fb = (feature_fn or _random_features)(jnp.asarray(b))
    total = 0.0
    for la, lb in zip(fa, fb):
        na = la / (jnp.linalg.norm(la, axis=-1, keepdims=True) + 1e-10)
        nb = lb / (jnp.linalg.norm(lb, axis=-1, keepdims=True) + 1e-10)
        total = total + jnp.mean(jnp.sum((na - nb) ** 2, -1), axis=(1, 2))
    return np.asarray(total)


def compute_lpips(gt_path: str, gen_path: str, feature_fn=None) -> float:
    gt = np.load(gt_path)
    gen = np.load(gen_path)
    to_hwc = lambda x: np.transpose(x, (0, 1, 3, 4, 2))
    gt, gen = to_hwc(gt), to_hwc(gen)
    b, t = gt.shape[:2]
    d = lpips_distance(
        gt.reshape((-1,) + gt.shape[2:]), gen.reshape((-1,) + gen.shape[2:]),
        feature_fn,
    ).reshape(b, t)
    # exclude all-black padded frames
    valid = np.abs(gt.reshape(b, t, -1)).max(-1) > 1e-6
    return float((d * valid).sum() / np.maximum(valid.sum(), 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("metrics_dir")
    p.add_argument("--it", default=None)
    args = p.parse_args()
    pattern = f"gt_seq_{args.it or '*'}.npy"
    for gt_path in sorted(glob.glob(os.path.join(args.metrics_dir, pattern))):
        gen_path = gt_path.replace("gt_seq_", "gen_images_")
        val = compute_lpips(gt_path, gen_path)
        print(f"{os.path.basename(gt_path)}: LPIPS = {val:.5f}")


if __name__ == "__main__":
    main()
