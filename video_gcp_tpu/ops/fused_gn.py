"""Fused GroupNorm + LeakyReLU Pallas kernel for the conv pyramids.

Motivation (experiments/profiles/mfu_breakdown.md): the bench rollout is
HBM-bandwidth-bound at ~0.95 utilization, and 4/5 of its traffic is the conv
decode pyramid. XLA lowers GroupNorm+LeakyReLU to two fusions — a stats
reduction (read x) and a normalize+activation map (read x, write y) — i.e.
three full-tensor HBM transits per norm site. This kernel keeps each sample's
activation tile resident in VMEM and does stats + normalize + activation in a
single pass: read x once, write y once. On a bandwidth-saturated graph that
removes ~1/3 of the norm-adjacent traffic (~3 GB of the 20.5 GB batch-32
rollout).

Layout: the NHWC activation is viewed as [N, H, W*C] so the lane dimension is
W*C (a multiple of 128 at every pyramid level of the published configs), and
per-(sample, group) statistics are computed with two small MXU contractions
against a static 0/1 lane->group matrix — no gathers, no relayouts.

Numerics follow flax.linen.GroupNorm (normalization.py _compute_stats /
_normalize): float32 stats, fast variance E[x^2]-E[x]^2 clipped at zero,
y = (x - mean) * rsqrt(var + eps) * scale + bias, cast to the compute dtype,
then leaky_relu. The backward pass is the jax.vjp of the pure-jnp reference
below, so gradients are exact (reference path) while the forward saves the
pass; use in `jax.grad` contexts is supported via custom_vjp.

Reference parity: the reference applies torch GroupNorm+LeakyReLU per conv
block (blox.torch encoder/decoder pyramids, gcp/prediction/base_gcp.py:78-79);
this is the TPU-native fusion of that block.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_BLOCK_BYTES_F32 = 2 << 20  # target per-block f32 footprint (~2 MB)


def fusable(shape, num_groups: int) -> bool:
    """Whether the Pallas path supports this activation shape.

    Requires NHWC with lanes W*C a multiple of 128 and channels divisible by
    the group count; anything else falls back to the reference path.
    """
    if len(shape) < 4:
        return False
    h, w, c = shape[-3], shape[-2], shape[-1]
    n = int(np.prod(shape[:-3], dtype=np.int64))
    return (
        n >= 1
        and h >= 1
        and (w * c) % 128 == 0
        and c % num_groups == 0
    )


def gn_lrelu_reference(
    x: Array,
    scale: Array,
    bias: Array,
    num_groups: int,
    eps: float = 1e-6,
    slope: float = 0.2,
    out_dtype=None,
) -> Array:
    """Pure-jnp GroupNorm+LeakyReLU mirroring flax.linen.GroupNorm numerics
    (float32 fast-variance stats, normalize, cast, activate). Used as the
    CPU/ineligible-shape fallback and as the source of the backward pass."""
    out_dtype = out_dtype or x.dtype
    orig_shape = x.shape
    c = orig_shape[-1]
    gs = c // num_groups
    xg = x.astype(jnp.float32).reshape(
        (-1,) + orig_shape[-3:-1] + (num_groups, gs))
    red = (1, 2, 4)  # H, W, group_size
    mean = jnp.mean(xg, axis=red)
    var = jnp.maximum(jnp.mean(xg * xg, axis=red) - mean * mean, 0.0)
    mean = jnp.repeat(mean, gs, axis=-1).reshape((-1, 1, 1, c))
    rstd = jax.lax.rsqrt(var + eps)
    rstd = jnp.repeat(rstd, gs, axis=-1).reshape((-1, 1, 1, c))
    xf = x.astype(jnp.float32).reshape((-1,) + orig_shape[-3:])
    y = (xf - mean) * rstd * scale.astype(jnp.float32) + bias.astype(
        jnp.float32)
    y = y.astype(out_dtype)
    y = jnp.where(y >= 0, y, slope * y)
    return y.reshape(orig_shape).astype(out_dtype)


def _gn_lrelu_kernel(x_ref, scale_ref, bias_ref, gmap_ref, out_ref, *,
                     m, eps, slope):
    """One block of samples: single-pass GN + leaky_relu in VMEM.

    x_ref:    [BN, H, WC] activations (compute dtype)
    scale/bias_ref: [1, WC] float32 per-lane affine (channel params tiled by W)
    gmap_ref: [WC, G] float32 0/1 lane->group membership
    out_ref:  [BN, H, WC]
    m: elements per (sample, group) = H * W * group_size (static)
    """
    x = x_ref[:].astype(jnp.float32)
    colsum = jnp.sum(x, axis=1)  # [BN, WC]
    colsq = jnp.sum(x * x, axis=1)
    gmap = gmap_ref[:]
    gsum = jnp.dot(colsum, gmap, preferred_element_type=jnp.float32)
    gsq = jnp.dot(colsq, gmap, preferred_element_type=jnp.float32)
    mean = gsum / m  # [BN, G]
    var = jnp.maximum(gsq / m - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    # broadcast per-group stats back onto lanes: contract over G
    dims = (((1,), (1,)), ((), ()))
    mean_l = jax.lax.dot_general(mean, gmap, dims,
                                 preferred_element_type=jnp.float32)
    rstd_l = jax.lax.dot_general(rstd, gmap, dims,
                                 preferred_element_type=jnp.float32)
    mul = rstd_l * scale_ref[:]  # [BN, WC]
    y32 = (x - mean_l[:, None, :]) * mul[:, None, :] + bias_ref[:][None, :, :]
    y = y32.astype(out_ref.dtype)
    # compare in f32: Mosaic (v5e) rejects bf16 vector cmpf ("Target does not
    # support this comparison"); sign(y32) == sign(y) up to bf16 zero-rounding
    out_ref[:] = jnp.where(y32 >= 0, y, slope * y)


def _pick_block_n(n: int, h: int, wc: int) -> int:
    """Samples per grid program: ~2 MB of f32 per block, multiple of 8."""
    bn = max(1, _BLOCK_BYTES_F32 // (h * wc * 4))
    bn = min(bn, n, 128)
    if bn >= 8:
        bn -= bn % 8
    return bn


@functools.lru_cache(maxsize=None)
def _lane_tables(w: int, c: int, num_groups: int):
    """Static lane->group membership matrix and the channel->lane tiler."""
    gs = c // num_groups
    lane_c = np.arange(w * c) % c
    gmap = (lane_c // gs)[:, None] == np.arange(num_groups)[None, :]
    # numpy, not jnp: this is lru_cached, and a jnp constant materialized
    # during one jit trace would leak that trace's tracer into later calls
    return np.asarray(gmap, np.float32)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "slope", "interpret"))
def _gn_lrelu_pallas(x: Array, scale: Array, bias: Array, num_groups: int,
                     eps: float, slope: float, interpret: bool) -> Array:
    orig_shape = x.shape
    h, w, c = orig_shape[-3:]
    wc = w * c
    n = int(np.prod(orig_shape[:-3], dtype=np.int64))
    x3 = x.reshape(n, h, wc)
    scale_l = jnp.tile(scale.astype(jnp.float32), w)[None, :]
    bias_l = jnp.tile(bias.astype(jnp.float32), w)[None, :]
    gmap = _lane_tables(w, c, num_groups)
    bn = _pick_block_n(n, h, wc)
    m = h * w * (c // num_groups)
    kernel = functools.partial(_gn_lrelu_kernel, m=m, eps=eps, slope=slope)
    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n, bn),),
        in_specs=[
            pl.BlockSpec((bn, h, wc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wc, num_groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, h, wc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wc), x.dtype),
        interpret=interpret,
    )(x3, scale_l, bias_l, gmap)
    return out.reshape(orig_shape)


@functools.lru_cache(maxsize=None)
def _make_fused(num_groups: int, eps: float, slope: float, interpret: bool):
    """custom_vjp wrapper: Pallas forward, reference-vjp backward."""

    @jax.custom_vjp
    def fused(x, scale, bias):
        return _gn_lrelu_pallas(x, scale, bias, num_groups, eps, slope,
                                interpret)

    def fwd(x, scale, bias):
        return fused(x, scale, bias), (x, scale, bias)

    def bwd(res, g):
        x, scale, bias = res
        _, vjp = jax.vjp(
            lambda xx, ss, bb: gn_lrelu_reference(
                xx, ss, bb, num_groups, eps, slope), x, scale, bias)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def fused_group_norm_lrelu(
    x: Array,
    scale: Array,
    bias: Array,
    num_groups: int,
    eps: float = 1e-6,
    slope: float = 0.2,
    interpret: bool | None = None,
) -> Array:
    """Single-pass GroupNorm+LeakyReLU; differentiable (reference backward).

    Falls back to the jnp reference when the shape is ineligible. `interpret`
    defaults to True off-TPU so tests exercise the kernel on CPU.
    """
    if not fusable(x.shape, num_groups):
        return gn_lrelu_reference(x, scale, bias, num_groups, eps, slope)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _make_fused(num_groups, float(eps), float(slope), interpret)(
        x, scale, bias)
