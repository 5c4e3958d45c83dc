"""Batched pairwise squared-L2 distance matrices, MXU-formulated.

Replaces ``blox.torch.ops.{batch_cdist, cdist}`` (cost matrices for adaptive
binding, gcp/prediction/models/adaptive_binding/adaptive.py:44-47, and the
node-vs-frame Gaussian likelihood, binding_loss.py:24). Instead of
materializing the [B, N, T, F] difference tensor, uses the expansion
||a - b||^2 = ||a||^2 + ||b||^2 - 2 a.b so the dominant cost is one batched
matmul on the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _flatten_features(x: jnp.ndarray, lead: int) -> jnp.ndarray:
    return x.reshape(x.shape[:lead] + (-1,))


def batch_cdist(
    a: jnp.ndarray, b: jnp.ndarray, reduction: str = "sum"
) -> jnp.ndarray:
    """Squared L2 distances between all pairs along axis 1.

    :param a: [B, N, ...feature...]
    :param b: [B, T, ...feature...]
    :param reduction: 'sum' or 'mean' over the feature dims.
    :return: [B, N, T]
    """
    af = _flatten_features(a, 2).astype(jnp.float32)
    bf = _flatten_features(b, 2).astype(jnp.float32)
    sq_a = jnp.sum(af ** 2, axis=-1)[:, :, None]
    sq_b = jnp.sum(bf ** 2, axis=-1)[:, None, :]
    # full f32 accumulation: the default matmul precision (bf16 multiplies on
    # TPU) is too coarse for a distance kernel feeding a DTW posterior
    cross = jnp.einsum("bnf,btf->bnt", af, bf, precision=jax.lax.Precision.HIGHEST)
    d = sq_a + sq_b - 2.0 * cross
    d = jnp.maximum(d, 0.0)  # guard tiny negatives from cancellation
    if reduction == "mean":
        d = d / af.shape[-1]
    elif reduction != "sum":
        raise ValueError(f"unknown reduction {reduction!r}")
    return d


def cdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unbatched pairwise squared L2: [N, F] x [M, F] -> [N, M]."""
    return batch_cdist(a[None], b[None])[0]
