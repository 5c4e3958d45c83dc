"""Loss objects returning (value, weight, breakdown, error_mat) records.

Mirrors the blox.torch.losses contract used throughout the reference: every loss
returns an AttrDict-like record with a scalar ``value``, a ``weight`` used by
``get_total_loss`` (total = sum(weight*value) / prod(traj_seq.shape[1:]),
gcp/prediction/models/base_gcp.py:294-304), an optional per-element
``error_mat`` and a reduced ``breakdown`` along one axis for layerwise logging
(tree_module.py:159-169).

Reduction convention: ``value`` = loss summed over all non-batch axes, averaged
over batch. ``get_total_loss`` then divides by the per-example element count,
yielding a per-element mean — matching the reference's normalization.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import struct

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.distributions import Gaussian

Array = jnp.ndarray
Scalar = Union[float, Array]


@struct.dataclass
class LossTerm:
    value: Array
    weight: Scalar = 1.0
    breakdown: Optional[Array] = None
    error_mat: Optional[Array] = None


def _reduce(error_mat: Array, weights: Scalar, breakdown_axis: Optional[int]):
    weighted = error_mat * weights
    batch = weighted.shape[0] if weighted.ndim > 0 else 1
    value = jnp.sum(weighted) / batch
    breakdown = None
    if breakdown_axis is not None and weighted.ndim > breakdown_axis:
        axes = tuple(i for i in range(weighted.ndim) if i != breakdown_axis)
        breakdown = jnp.sum(weighted, axis=axes) / batch
    return value, breakdown


def l2_loss(
    pred: Array,
    target: Array,
    weights: Scalar = 1.0,
    weight: Scalar = 1.0,
    breakdown: Optional[int] = None,
) -> LossTerm:
    error_mat = (pred - target) ** 2
    value, bd = _reduce(error_mat, weights, breakdown)
    return LossTerm(value=value, weight=weight, breakdown=bd, error_mat=error_mat)


def kl_divergence_loss(
    q: Gaussian,
    p: Gaussian,
    weights: Scalar = 1.0,
    weight: Scalar = 1.0,
    free_nats_per_dim: float = 0.0,
    breakdown: Optional[int] = 1,
) -> LossTerm:
    """KL(q||p) with per-dimension free nats (blox KLDivLoss2; sequential.py:65,
    inference.py:42). Free bits formulation: each latent dim contributes at
    least ``free_nats_per_dim`` so the optimizer cannot collapse it further."""
    kl = q.kl_divergence(p)
    if free_nats_per_dim > 0.0:
        kl = jnp.maximum(kl, free_nats_per_dim)
    value, bd = _reduce(kl, weights, breakdown)
    return LossTerm(value=value, weight=weight, breakdown=bd, error_mat=kl)


def bce_logits_loss(
    logits: Array,
    target: Array,
    weights: Scalar = 1.0,
    weight: Scalar = 1.0,
    breakdown: Optional[int] = None,
) -> LossTerm:
    """Binary cross-entropy with logits (existence/distance predictors,
    frame_binding.py:84, adaptive.py:123)."""
    # numerically stable: max(x,0) - x*t + log(1+exp(-|x|))
    error_mat = (
        jnp.maximum(logits, 0.0)
        - logits * target
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    value, bd = _reduce(error_mat, weights, breakdown)
    return LossTerm(value=value, weight=weight, breakdown=bd, error_mat=error_mat)


def ce_logits_loss(
    logits: Array,
    target_index: Array,
    weights: Scalar = 1.0,
    weight: Scalar = 1.0,
) -> LossTerm:
    """Softmax cross-entropy against integer targets (length predictor CE,
    auxilliary_models/misc.py:38-56)."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logprobs, target_index[..., None], axis=-1)[..., 0]
    error_mat = -picked
    value, bd = _reduce(error_mat, weights, None)
    return LossTerm(value=value, weight=weight, breakdown=bd, error_mat=error_mat)


def penalty_loss(
    value: Array, weight: Scalar = 1.0, breakdown: Optional[int] = None,
    reduction: Optional[Sequence[int]] = None,
) -> LossTerm:
    """Penalty on an arbitrary precomputed quantity (blox PenaltyLoss;
    entropy penalty tree_module.py:128, adaptive losses adaptive.py:83-117)."""
    error_mat = value
    if reduction is not None:
        value = jnp.sum(value, axis=tuple(reduction))
    bd = None
    if breakdown is not None and error_mat.ndim > breakdown:
        axes = tuple(i for i in range(error_mat.ndim) if i != breakdown)
        bd = jnp.sum(error_mat, axis=axes) / error_mat.shape[0]
    batch = value.shape[0] if value.ndim > 0 else 1
    scalar = jnp.sum(value) / batch
    return LossTerm(value=scalar, weight=weight, breakdown=bd, error_mat=error_mat)


def gaussian_nll_loss(
    pred: Array,
    target: Array,
    log_sigma: Scalar,
    weights: Scalar = 1.0,
    weight: Scalar = 1.0,
    breakdown: Optional[int] = 1,
) -> LossTerm:
    """Gaussian decoder NLL with (learned) global log_sigma
    (DecoderModule.nll, used by BalancedBinding.reconstruction_loss,
    frame_binding.py:97)."""
    error_mat = (
        0.5 * ((pred - target) * jnp.exp(-log_sigma)) ** 2
        + log_sigma
        + 0.5 * jnp.log(2 * jnp.pi)
    )
    value, bd = _reduce(error_mat, weights, breakdown)
    return LossTerm(value=value, weight=weight, breakdown=bd, error_mat=error_mat)


def total_loss(losses: AttrDict, per_example_numel: int) -> Array:
    """Weighted sum over loss terms, normalized by per-example element count
    (base_gcp.py:294-304). Terms with weight <= 0 are excluded (weight 0 terms
    are log-only, e.g. nll)."""
    total = 0.0
    for term in losses.values():
        w = term.weight
        if isinstance(w, (int, float)) and w <= 0:
            continue
        total = total + term.value * w
    return total / per_example_numel
