"""Gaussian latent-variable machinery (blox.torch.variational surface).

The reference builds variational heads via ``setup_variational_inference``
returning a q network and a learned/fixed prior, with Gaussians exposing
``.sample/.reparametrize/.mu`` and ``ProbabilisticModel.switch_to_prior``
runtime mode switching (gcp/prediction/models/base_gcp.py:44-53,
blox.torch.variational per SURVEY.md §2.9). In functional JAX the mode switch
becomes an explicit argument threaded through ``forward`` and sampling takes an
explicit PRNG key.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Gaussian:
    """Diagonal Gaussian as a pytree: mu and log_sigma stacked on the last axis."""

    mu: jnp.ndarray
    log_sigma: jnp.ndarray

    @classmethod
    def from_concat(cls, x: jnp.ndarray) -> "Gaussian":
        """Build from a network output where the last axis is [mu; log_sigma]."""
        mu, log_sigma = jnp.split(x, 2, axis=-1)
        # clamp for numerical stability of exp / kl
        log_sigma = jnp.clip(log_sigma, -10.0, 10.0)
        return cls(mu=mu, log_sigma=log_sigma)

    @property
    def sigma(self) -> jnp.ndarray:
        return jnp.exp(self.log_sigma)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        eps = jax.random.normal(rng, self.mu.shape, self.mu.dtype)
        return self.mu + self.sigma * eps

    def reparametrize(self, eps: jnp.ndarray) -> jnp.ndarray:
        """Map a standard-normal sample into this Gaussian (used when external
        latents z are injected by the planner, tree_module.py:81-82)."""
        return self.mu + self.sigma * eps

    def kl_divergence(self, other: "Gaussian") -> jnp.ndarray:
        """KL(self || other), per dimension (no reduction)."""
        return (
            other.log_sigma
            - self.log_sigma
            + (self.sigma ** 2 + (self.mu - other.mu) ** 2) / (2.0 * other.sigma ** 2)
            - 0.5
        )

    def entropy(self) -> jnp.ndarray:
        return 0.5 + 0.5 * jnp.log(2 * jnp.pi) + self.log_sigma

    def nll(self, x: jnp.ndarray) -> jnp.ndarray:
        return (
            0.5 * ((x - self.mu) / self.sigma) ** 2
            + self.log_sigma
            + 0.5 * jnp.log(2 * jnp.pi)
        )


def unit_gaussian(shape, dtype=jnp.float32) -> Gaussian:
    """Fixed standard-normal prior (blox FixedPrior)."""
    return Gaussian(mu=jnp.zeros(shape, dtype), log_sigma=jnp.zeros(shape, dtype))


def safe_entropy(dist: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Entropy of a categorical distribution given as probabilities
    (blox.torch.dist.safe_entropy; used on match distributions,
    tree_module.py:145)."""
    return -jnp.sum(dist * jnp.log(dist + eps), axis=axis)


def normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize a nonnegative tensor to sum to 1 along ``axis``
    (blox.torch.dist.normalize; adaptive.py:58)."""
    return x / (jnp.sum(x, axis=axis, keepdims=True) + eps)


def categorical_sample(logits: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Sample indices from a categorical over the last axis."""
    return jax.random.categorical(rng, logits, axis=-1)


def one_hot_categorical_sample(
    logits: jnp.ndarray, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Sample a one-hot vector; with rng=None returns argmax one-hot (eval)."""
    if rng is None:
        idx = jnp.argmax(logits, axis=-1)
    else:
        idx = jax.random.categorical(rng, logits, axis=-1)
    return jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
