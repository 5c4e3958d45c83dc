"""Frechet Video Distance over dumped sequence files.

Reference: gcp/evaluation/fvd/compute_fvd.py:27-88 + frechet_video_distance.py
(TF1 + tfhub I3D). This rebuild keeps the exact protocol — load
`gt_seq_*.npy` / `gen_images_*.npy` (channel-first [B, T, C, H, W] in [-1, 1]),
detect variable lengths via all-black frames (compute_fvd.py's black-frame
rule), embed every video, compute the Frechet distance between Gaussian
moments — with a selectable embedding:

- **real I3D** when Kinetics-400 I3D weights are available locally: set
  `GCP_I3D_WEIGHTS` (or pass `--weights`) to a pytorch-i3d style checkpoint
  (`rgb_imagenet.pt` / `rgb_charades.pt` naming: `Conv3d_1a_7x7.conv3d.weight`,
  `Mixed_3b.b1a.bn.running_mean`, ...). The InceptionI3d forward is rebuilt in
  JAX (`i3d_embed_fn`) and produces the 400-d logits embedding FVD is defined
  on. With these weights the numbers are true FVD.
- `embed_fn=None` without weights falls back to a fixed-seed random 3D-conv
  feature stack — clearly a PROXY, not FVD: reproducible and usable for
  relative comparisons within this codebase only.
- or pass any `embed_fn` mapping [B, T, H, W, C] in [0, 255] -> [B, D].

CLI: python -m video_gcp_tpu.evaluation.fvd <metrics_dir> [--it N]
    [--weights /path/to/i3d.pt]
"""
from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

I3D_WEIGHTS_ENV = "GCP_I3D_WEIGHTS"


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


# ---------------------------------------------------------------------------
# InceptionI3d (Kinetics-400) rebuilt in JAX for the true-FVD embedding.
# Layer table mirrors the standard I3D graph (tfhub FVD backbone /
# pytorch-i3d); weights load from a local torch checkpoint.
# ---------------------------------------------------------------------------

# Inception mixed-block branch channels:
# (b0_1x1, b1a_1x1, b1b_3x3, b2a_1x1, b2b_3x3, b3b_1x1)
_I3D_MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


def i3d_param_shapes(num_classes: int = 400) -> dict:
    """Expected checkpoint tensor shapes (torch OIDHW conv layout), keyed by
    pytorch-i3d state-dict names. Useful for validating a checkpoint or
    constructing a synthetic one in tests."""
    shapes = {}

    def unit(name, in_ch, out_ch, k):
        shapes[f"{name}.conv3d.weight"] = (out_ch, in_ch, k, k, k) \
            if isinstance(k, int) else (out_ch, in_ch) + k
        for p in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"{name}.bn.{p}"] = (out_ch,)
        return out_ch

    unit("Conv3d_1a_7x7", 3, 64, 7)
    unit("Conv3d_2b_1x1", 64, 64, 1)
    unit("Conv3d_2c_3x3", 64, 192, 3)
    in_ch = 192
    for name, (b0, b1a, b1b, b2a, b2b, b3b) in _I3D_MIXED.items():
        unit(f"{name}.b0", in_ch, b0, 1)
        unit(f"{name}.b1a", in_ch, b1a, 1)
        unit(f"{name}.b1b", b1a, b1b, 3)
        unit(f"{name}.b2a", in_ch, b2a, 1)
        unit(f"{name}.b2b", b2a, b2b, 3)
        unit(f"{name}.b3b", in_ch, b3b, 1)
        in_ch = b0 + b1b + b2b + b3b
    shapes["logits.conv3d.weight"] = (num_classes, in_ch, 1, 1, 1)
    shapes["logits.conv3d.bias"] = (num_classes,)
    return shapes


def load_i3d_params(path: str) -> dict:
    """Torch checkpoint -> {name: np.ndarray} with conv kernels transposed to
    jax DHWIO layout and BN folded to (scale, shift). Read with the
    torch-free zip-checkpoint reader (core/torch_ckpt.py)."""
    from video_gcp_tpu.core.torch_ckpt import load_state_dict

    sd = load_state_dict(path)
    params = {}
    for key, val in sd.items():
        if key.endswith("conv3d.weight"):
            # torch OIDHW -> jax DHWIO
            params[key] = np.transpose(val, (2, 3, 4, 1, 0))
        else:
            params[key] = val
    for key in list(params):
        if key.endswith(".bn.running_var"):
            base = key[: -len(".running_var")]
            gamma = params.get(base + ".weight",
                               np.ones_like(params[key]))
            beta = params.get(base + ".bias", np.zeros_like(params[key]))
            mean, var = params[base + ".running_mean"], params[key]
            inv = gamma / np.sqrt(var + 1e-3)  # torch BatchNorm3d eps=1e-3
            params[base + ".scale"] = inv
            params[base + ".shift"] = beta - mean * inv
    return params


def _i3d_unit(params, name, x, stride=1):
    """conv3d + folded BN + relu (pytorch-i3d Unit3D, TF-SAME padding)."""
    w = jnp.asarray(params[f"{name}.conv3d.weight"], jnp.float32)
    s = (stride,) * 3 if isinstance(stride, int) else stride
    x = jax.lax.conv_general_dilated(
        x, w, window_strides=s, padding="SAME",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    x = x * jnp.asarray(params[f"{name}.bn.scale"]) \
        + jnp.asarray(params[f"{name}.bn.shift"])
    return jax.nn.relu(x)


def _max_pool3d(x, window, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) + window + (1,), (1,) + stride + (1,),
        "SAME")


def _i3d_mixed(params, name, x):
    b0 = _i3d_unit(params, f"{name}.b0", x)
    b1 = _i3d_unit(params, f"{name}.b1b", _i3d_unit(params, f"{name}.b1a", x))
    b2 = _i3d_unit(params, f"{name}.b2b", _i3d_unit(params, f"{name}.b2a", x))
    b3 = _i3d_unit(params, f"{name}.b3b",
                   _max_pool3d(x, (3, 3, 3), (1, 1, 1)))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


@jax.jit
def _i3d_logits(params, x):
    """[B, T, 224, 224, 3] in [-1, 1] -> [B, 400] Kinetics logits."""
    x = _i3d_unit(params, "Conv3d_1a_7x7", x, stride=2)
    x = _max_pool3d(x, (1, 3, 3), (1, 2, 2))
    x = _i3d_unit(params, "Conv3d_2b_1x1", x)
    x = _i3d_unit(params, "Conv3d_2c_3x3", x)
    x = _max_pool3d(x, (1, 3, 3), (1, 2, 2))
    x = _i3d_mixed(params, "Mixed_3b", x)
    x = _i3d_mixed(params, "Mixed_3c", x)
    x = _max_pool3d(x, (3, 3, 3), (2, 2, 2))
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _i3d_mixed(params, name, x)
    x = _max_pool3d(x, (2, 2, 2), (2, 2, 2))
    x = _i3d_mixed(params, "Mixed_5b", x)
    x = _i3d_mixed(params, "Mixed_5c", x)
    # global spatial average + logits conv, averaged over remaining time
    x = x.mean(axis=(2, 3), keepdims=True)
    w = jnp.asarray(params["logits.conv3d.weight"], jnp.float32)
    b = jnp.asarray(params["logits.conv3d.bias"], jnp.float32)
    x = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC")) + b
    return x.mean(axis=(1, 2, 3))


def i3d_embed_fn(weights_path: str, batch: int = 16):
    """True-FVD embedding from a local I3D checkpoint.

    Returns embed_fn: [B, T, H, W, C] uint8-range floats -> [B, 400] logits
    (the embedding the published FVD is defined on). Frames are resized to
    224x224 and scaled to [-1, 1] as in frechet_video_distance.py.
    """
    params = load_i3d_params(weights_path)

    def embed(videos: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(videos), batch):
            v = jnp.asarray(videos[i : i + batch], jnp.float32) / 127.5 - 1.0
            b, t = v.shape[:2]
            v = jax.image.resize(v, (b, t, 224, 224, v.shape[-1]), "bilinear")
            out.append(np.asarray(_i3d_logits(params, v)))
        return np.concatenate(out)

    return embed


def default_embed_fn():
    """Real I3D when $GCP_I3D_WEIGHTS points at a checkpoint, else the
    random-feature proxy (clearly not FVD; relative comparisons only)."""
    path = os.environ.get(I3D_WEIGHTS_ENV)
    if path and os.path.exists(path):
        return i3d_embed_fn(path), "i3d"
    return _random_conv_embed, "random-proxy"


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
    embed = embed_fn if embed_fn is not None else default_embed_fn()[0]
    return frechet_distance(embed(gt), embed(gen))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("metrics_dir")
    p.add_argument("--it", default=None)
    p.add_argument("--weights", default=None,
                   help=f"I3D checkpoint (default: ${I3D_WEIGHTS_ENV})")
    args = p.parse_args()
    if args.weights:
        embed, kind = i3d_embed_fn(args.weights), "i3d"
    else:
        embed, kind = default_embed_fn()
    label = "FVD" if kind == "i3d" else "FVD-proxy(random-feat)"
    pattern = f"gt_seq_{args.it or '*'}.npy"
    for gt_path in sorted(glob.glob(os.path.join(args.metrics_dir, pattern))):
        gen_path = gt_path.replace("gt_seq_", "gen_images_")
        fvd = compute_fvd(gt_path, gen_path, embed_fn=embed)
        print(f"{os.path.basename(gt_path)}: {label} = {fvd:.3f}")


if __name__ == "__main__":
    main()
