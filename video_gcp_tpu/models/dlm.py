"""Discretized logistic mixture output distribution for the decoder.

The published nav configs set decoder_distribution='discrete_logistic_mixture'
(experiments/prediction/*/conf.py). Standard PixelCNN++-style discretized
mixture of logistics over [-1, 1] pixels with 256 bins, per-channel means and
scales and a shared mixture indicator (no channel autoregression — the
reference blox implementation is not in the checkout, this is the canonical
formulation).

Decoder raw output layout (last axis): [n_mix logits | n_mix*C means |
n_mix*C log_scales] -> n_mix * (1 + 2C) channels.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

N_MIX = 10


def n_dlm_channels(n_channels: int, n_mix: int = N_MIX) -> int:
    return n_mix * (1 + 2 * n_channels)


def split_params(raw: Array, n_channels: int, n_mix: int = N_MIX
                 ) -> Tuple[Array, Array, Array]:
    """raw [..., n_mix*(1+2C)] -> (logits [..., M], means [..., M, C],
    log_scales [..., M, C])."""
    logits = raw[..., :n_mix]
    means = raw[..., n_mix : n_mix + n_mix * n_channels]
    log_scales = raw[..., n_mix + n_mix * n_channels :]
    shape = raw.shape[:-1] + (n_mix, n_channels)
    means = jnp.tanh(means.reshape(shape))  # keep means inside pixel range
    log_scales = jnp.clip(log_scales.reshape(shape), -7.0, 3.0)
    return logits, means, log_scales


def nll(raw: Array, target: Array, n_mix: int = N_MIX) -> Array:
    """Per-pixel negative log-likelihood.

    :param raw: [..., H, W, n_mix*(1+2C)]
    :param target: [..., H, W, C] in [-1, 1]
    :return: [..., H, W] summed over channels.
    """
    c = target.shape[-1]
    logits, means, log_scales = split_params(raw, c, n_mix)
    x = target[..., None, :]  # [..., 1, C] broadcast over mixtures
    inv_s = jnp.exp(-log_scales)
    half_bin = 1.0 / 255.0

    plus = inv_s * (x - means + half_bin)
    minus = inv_s * (x - means - half_bin)
    cdf_plus = jax.nn.sigmoid(plus)
    cdf_minus = jax.nn.sigmoid(minus)

    # edge bins integrate the full tail
    log_cdf_plus = plus - jax.nn.softplus(plus)  # log sigmoid(plus)
    log_one_minus_cdf_minus = -jax.nn.softplus(minus)
    cdf_delta = cdf_plus - cdf_minus

    # mid-bin approximation for tiny deltas (numerical floor)
    mid = inv_s * (x - means)
    log_pdf_mid = mid - log_scales - 2.0 * jax.nn.softplus(mid)
    log_prob_bin = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_minus,
            jnp.where(
                cdf_delta > 1e-5,
                jnp.log(jnp.clip(cdf_delta, 1e-12)),
                log_pdf_mid - jnp.log(127.5),
            ),
        ),
    )  # [..., M, C]
    log_probs = jnp.sum(log_prob_bin, axis=-1) + jax.nn.log_softmax(logits, -1)
    return -jax.nn.logsumexp(log_probs, axis=-1)


def mean(raw: Array, n_channels: int, n_mix: int = N_MIX) -> Array:
    """Mixture mean (cheap deterministic decode for logging/planning)."""
    logits, means, _ = split_params(raw, n_channels, n_mix)
    w = jax.nn.softmax(logits, -1)[..., None]
    return jnp.sum(w * means, axis=-2)


def sample(raw: Array, rng: jax.Array, n_channels: int,
           n_mix: int = N_MIX) -> Array:
    """Ancestral sample: mixture indicator then logistic noise."""
    logits, means, log_scales = split_params(raw, n_channels, n_mix)
    k1, k2 = jax.random.split(rng)
    idx = jax.random.categorical(k1, logits, axis=-1)  # [...]
    sel = jax.nn.one_hot(idx, n_mix)[..., None]
    mu = jnp.sum(sel * means, -2)
    log_s = jnp.sum(sel * log_scales, -2)
    u = jax.random.uniform(k2, mu.shape, minval=1e-5, maxval=1 - 1e-5)
    x = mu + jnp.exp(log_s) * (jnp.log(u) - jnp.log(1 - u))
    return jnp.clip(x, -1.0, 1.0)
