"""Image quality metrics: MSE / PSNR / SSIM, fully batched on device.

Replaces ``blox.torch.evaluation.{mse, psnr, ssim}`` (imported at
gcp/evaluation/compute_metrics.py:11). All functions assume images in [-1, 1]
(the framework's canonical pixel range, data_loader.py:220) and operate over
arbitrary leading batch axes so the top-of-100 evaluation protocol can vmap a
sample axis instead of looping (SURVEY.md §7 hard part 3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _to01(x):
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def to_float_images(x):
    """uint8 [0, 255] -> float32 [-1, 1]; floats pass through unchanged.

    The input pipeline ships image batches as uint8 (4x less host->device
    traffic — on a tunneled TPU the transfer otherwise dominates step time)
    and normalization runs on device at the consumer."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 127.5 - 1.0
    return x


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-image mean squared error in [0,1] range. Reduces over the trailing
    (H, W, C) axes; preserves leading axes."""
    err = (_to01(pred) - _to01(target)) ** 2
    return jnp.mean(err, axis=(-1, -2, -3))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Peak signal-to-noise ratio (max value 1.0 after [0,1] mapping)."""
    m = mse(pred, target)
    return -10.0 * jnp.log10(m + eps)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Structural similarity (standard Wang et al. formulation, 11x11 Gaussian
    window), per image over trailing (H, W, C); matches the conventions of the
    skimage/blox implementation the reference evaluator uses.

    Accepts [..., H, W, C]; returns [...]."""
    p = _to01(pred)
    t = _to01(target)
    lead = p.shape[:-3]
    h, w, c = p.shape[-3:]
    p = p.reshape((-1, h, w, c))
    t = t.reshape((-1, h, w, c))

    kern = _gaussian_kernel(kernel_size, sigma)[:, :, None, None]  # HWIO, per-chan
    kern = jnp.tile(kern, (1, 1, 1, c))

    def filt(x):
        # depthwise conv: feature_group_count = C. precision=HIGHEST: the
        # variance terms E[x^2] - E[x]^2 cancel catastrophically under the
        # TPU's default bf16 convolution precision
        return jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    mu_p = filt(p)
    mu_t = filt(t)
    mu_pp = filt(p * p) - mu_p ** 2
    mu_tt = filt(t * t) - mu_t ** 2
    mu_pt = filt(p * t) - mu_p * mu_t
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)) / (
        (mu_p ** 2 + mu_t ** 2 + c1) * (mu_pp + mu_tt + c2)
    )
    out = jnp.mean(ssim_map, axis=(1, 2, 3))
    return out.reshape(lead)
