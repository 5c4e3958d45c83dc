"""Perceptual distance over dumped sequences (LPIPS protocol).

Reference: gcp/evaluation/lpips/compute_lpips.py:18-62 (AlexNet perceptual
loss over gen_images/gt_seq .npy dumps). Feature stacks, in priority order:

- **real AlexNet-LPIPS** when weights are available locally: set
  `GCP_LPIPS_WEIGHTS` (or pass `--weights`) to a directory or file providing
  torchvision `alexnet` features (`features.0.weight`, ...) and, optionally,
  the lpips 'alex' linear head (`lin0.model.1.weight`, ...). With both, the
  numbers are true LPIPS(alex); with only the backbone, unweighted
  AlexNet-perceptual distance.
- otherwise a fixed-seed random conv pyramid — the LPIPS computation graph
  with untrained features: a reproducible PROXY for relative comparisons
  within this codebase, not comparable to published LPIPS values.

CLI: python -m video_gcp_tpu.evaluation.lpips <metrics_dir> [--it N]
    [--weights /path/to/weights]
"""
from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

LPIPS_WEIGHTS_ENV = "GCP_LPIPS_WEIGHTS"

# torchvision AlexNet feature stack: (out_ch, kernel, stride, pad) per conv,
# with 3x3/stride-2 max-pools after convs 0, 1, and 4; LPIPS taps every relu
_ALEXNET_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
                  (256, 3, 1, 1), (256, 3, 1, 1)]
# LPIPS input normalization (lpips.networks scaling layer)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


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


# ---------------------------------------------------------------------------
# real AlexNet-LPIPS from local torch checkpoints
# ---------------------------------------------------------------------------


def _load_torch_arrays(path: str) -> dict:
    from video_gcp_tpu.core.torch_ckpt import load_state_dict

    return load_state_dict(path)


def load_lpips_params(weights_path: str) -> dict:
    """Gather AlexNet backbone (+ optional lpips lin head) tensors.

    `weights_path` may be one checkpoint file holding both, or a directory
    containing `alexnet*.pth` and optionally `*alex*.pth` (the lpips head).
    Conv kernels are transposed torch OIHW -> jax HWIO.
    """
    files = [weights_path]
    if os.path.isdir(weights_path):
        files = sorted(glob.glob(os.path.join(weights_path, "*.pt"))
                       + glob.glob(os.path.join(weights_path, "*.pth")))
        assert files, f"no .pt/.pth files under {weights_path}"
    raw = {}
    for f in files:
        raw.update(_load_torch_arrays(f))

    params = {"convs": [], "lins": None}
    for i, conv_idx in enumerate([0, 3, 6, 8, 10]):  # torchvision indices
        w = raw.get(f"features.{conv_idx}.weight")
        assert w is not None, \
            f"missing AlexNet tensor features.{conv_idx}.weight"
        params["convs"].append(
            (np.transpose(w, (2, 3, 1, 0)), raw[f"features.{conv_idx}.bias"]))
    lins = [raw.get(f"lin{i}.model.1.weight") for i in range(5)]
    if all(l is not None for l in lins):
        params["lins"] = [l.reshape(-1) for l in lins]  # [C] each
    return params


def alexnet_feature_fn(weights_path: str):
    """LPIPS(alex) feature_fn from local weights: returns per-layer feature
    maps; the lin head (if present) is attached as `.lins`."""
    params = load_lpips_params(weights_path)

    @jax.jit
    def _features(x):  # [N, H, W, C] in [-1, 1]
        h = (x - _LPIPS_SHIFT) / _LPIPS_SCALE
        feats = []
        for i, ((w, b), (_, _, stride, pad)) in enumerate(
                zip(params["convs"], _ALEXNET_CONVS)):
            h = jax.lax.conv_general_dilated(
                h, jnp.asarray(w), window_strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(b)
            h = jax.nn.relu(h)
            feats.append(h)
            if i in (0, 1):  # 3x3/s2 max-pools after relu1 and relu2
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                    "VALID")
        return feats

    def features(x):  # plain wrapper: jit callables reject attributes
        return _features(x)

    features.lins = params["lins"]
    return features


def default_feature_fn():
    """Real AlexNet when $GCP_LPIPS_WEIGHTS is set, else the random proxy."""
    path = os.environ.get(LPIPS_WEIGHTS_ENV)
    if path and os.path.exists(path):
        return alexnet_feature_fn(path), "alex"
    return _random_features, "random-proxy"


def lpips_distance(a: np.ndarray, b: np.ndarray, feature_fn=None) -> np.ndarray:
    """Per-image perceptual distance. a, b: [N, H, W, C] in [-1, 1].

    With a feature_fn exposing `.lins` (the lpips linear head) the layer
    distances are lin-weighted 1x1 projections (true LPIPS); otherwise each
    layer contributes the unweighted mean squared unit-normalized difference.
    """
    fn = feature_fn if feature_fn is not None else _random_features
    fa, fb = fn(jnp.asarray(a)), fn(jnp.asarray(b))
    lins = getattr(fn, "lins", None)
    total = 0.0
    for i, (la, lb) in enumerate(zip(fa, fb)):
        na = la / (jnp.linalg.norm(la, axis=-1, keepdims=True) + 1e-10)
        nb = lb / (jnp.linalg.norm(lb, axis=-1, keepdims=True) + 1e-10)
        diff2 = (na - nb) ** 2
        if lins is not None:
            total = total + jnp.mean(
                jnp.sum(diff2 * jnp.asarray(lins[i]), -1), axis=(1, 2))
        else:
            total = total + jnp.mean(jnp.sum(diff2, -1), axis=(1, 2))
    return np.asarray(total)


def compute_lpips(gt_path: str, gen_path: str, feature_fn=None) -> float:
    if feature_fn is None:
        feature_fn = default_feature_fn()[0]
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
    p.add_argument("--weights", default=None,
                   help=f"AlexNet/lpips weights (default: ${LPIPS_WEIGHTS_ENV})")
    args = p.parse_args()
    if args.weights:
        feature_fn, kind = alexnet_feature_fn(args.weights), "alex"
    else:
        feature_fn, kind = default_feature_fn()
    label = "LPIPS" if kind == "alex" else "LPIPS-proxy(random-feat)"
    pattern = f"gt_seq_{args.it or '*'}.npy"
    for gt_path in sorted(glob.glob(os.path.join(args.metrics_dir, pattern))):
        gen_path = gt_path.replace("gt_seq_", "gen_images_")
        val = compute_lpips(gt_path, gen_path, feature_fn)
        print(f"{os.path.basename(gt_path)}: {label} = {val:.5f}")


if __name__ == "__main__":
    main()
