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
then leaky_relu. The backward pass is a second single-pass Pallas kernel
(read x and dy once, write dx once, per-block dscale/dbias partials) using
the standard GroupNorm backward with mean/rstd recomputed in VMEM — vs the
jax.vjp-of-reference fallback (GCP_FUSED_GN_BWD=ref) which re-runs the
forward and costs ~2 extra full-tensor HBM transits. Training with
GCP_FUSED_GN=1 therefore saves bandwidth in both directions.

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


def _pick_block_n(n: int, h: int, wc: int,
                  target_bytes: int = _BLOCK_BYTES_F32) -> int:
    """Samples per grid program: ~target_bytes of f32 per block-tensor,
    multiple of 8."""
    bn = max(1, target_bytes // (h * wc * 4))
    bn = min(bn, n, 128)
    if bn >= 8:
        bn -= bn % 8
    return bn


def _gn_lrelu_bwd_kernel(x_ref, g_ref, scale_ref, bias_ref, gmap_ref,
                         dx_ref, dsc_ref, dbi_ref, *, n, m, eps, slope):
    """One block of samples: single-pass GN+LeakyReLU backward in VMEM.

    Recomputes mean/rstd from x (cheap in VMEM — avoids an HBM residual),
    then applies the standard GroupNorm backward
        dx = rstd * (dx̂ − Σg dx̂ / m − x̂ · Σg(dx̂·x̂) / m)
    with the group sums as the same lane->group MXU contractions the forward
    uses. dscale/dbias accumulate into one revisited [8, WC] VMEM block
    across the (sequential) grid — zero-initialized at program 0 — because
    Mosaic requires output block sublanes divisible by 8, so per-block [1, WC]
    partial rows are not lowerable (v5e rejects them). Rows past the real
    sample count `n` (ragged grid tail) are zero-masked at the inputs so they
    cannot poison the parameter sums.
    The formula treats the fast-variance zero-clip as inactive; when the clip
    does bind (exactly constant inputs) x̂ ≡ 0 and the affected term vanishes.
    """
    bn = x_ref.shape[0]
    row = pl.program_id(0) * bn + jax.lax.broadcasted_iota(
        jnp.int32, (bn, 1, 1), 0)
    valid = row < n
    x = jnp.where(valid, x_ref[:].astype(jnp.float32), 0.0)
    g = jnp.where(valid, g_ref[:].astype(jnp.float32), 0.0)
    gmap = gmap_ref[:]
    colsum = jnp.sum(x, axis=1)
    colsq = jnp.sum(x * x, axis=1)
    gsum = jnp.dot(colsum, gmap, preferred_element_type=jnp.float32)
    gsq = jnp.dot(colsq, gmap, preferred_element_type=jnp.float32)
    mean = gsum / m
    var = jnp.maximum(gsq / m - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    dims = (((1,), (1,)), ((), ()))
    mean_l = jax.lax.dot_general(mean, gmap, dims,
                                 preferred_element_type=jnp.float32)
    rstd_l = jax.lax.dot_general(rstd, gmap, dims,
                                 preferred_element_type=jnp.float32)
    xc = x - mean_l[:, None, :]
    xhat = xc * rstd_l[:, None, :]
    # activation mask from the same f32 pre-activation the forward compared
    mul = rstd_l * scale_ref[:]
    y_pre = xc * mul[:, None, :] + bias_ref[:][None, :, :]
    dyp = jnp.where(y_pre >= 0, g, slope * g)
    dxhat = dyp * scale_ref[:][None, :, :]
    cs1 = jnp.sum(dxhat, axis=1)  # [BN, WC]
    cs2 = jnp.sum(dxhat * xhat, axis=1)
    s1 = jnp.dot(cs1, gmap, preferred_element_type=jnp.float32)  # [BN, G]
    s2 = jnp.dot(cs2, gmap, preferred_element_type=jnp.float32)
    s1_l = jax.lax.dot_general(s1, gmap, dims,
                               preferred_element_type=jnp.float32)
    s2_l = jax.lax.dot_general(s2, gmap, dims,
                               preferred_element_type=jnp.float32)
    dx = rstd_l[:, None, :] * (
        dxhat - s1_l[:, None, :] / m - xhat * (s2_l[:, None, :] / m))
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dsc_ref[:] = jnp.zeros_like(dsc_ref)
        dbi_ref[:] = jnp.zeros_like(dbi_ref)

    dsc_ref[:] += jnp.sum(dyp * xhat, axis=(0, 1))[None, :]
    dbi_ref[:] += jnp.sum(dyp, axis=(0, 1))[None, :]


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "slope", "interpret"))
def _gn_lrelu_bwd_pallas(x: Array, g: Array, scale: Array, bias: Array,
                         num_groups: int, eps: float, slope: float,
                         interpret: bool):
    """Pallas backward: read x and dy once, write dx once (3 HBM transits vs
    the reference-vjp recompute's ~5). Returns (dx, dscale, dbias) with the
    primal dtypes, as custom_vjp requires."""
    orig_shape = x.shape
    h, w, c = orig_shape[-3:]
    wc = w * c
    n = int(np.prod(orig_shape[:-3], dtype=np.int64))
    x3 = x.reshape(n, h, wc)
    g3 = g.reshape(n, h, wc)
    scale_l = jnp.tile(scale.astype(jnp.float32), w)[None, :]
    bias_l = jnp.tile(bias.astype(jnp.float32), w)[None, :]
    gmap = _lane_tables(w, c, num_groups)
    # backward keeps ~6 block-sized f32 temporaries live; halve the block
    bn = _pick_block_n(n, h, wc, _BLOCK_BYTES_F32 // 2)
    nblocks = pl.cdiv(n, bn)
    m = h * w * (c // num_groups)
    kernel = functools.partial(_gn_lrelu_bwd_kernel, n=n, m=m, eps=eps,
                               slope=slope)
    dx3, dsc_p, dbi_p = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((bn, h, wc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h, wc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wc, num_groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, h, wc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, wc), x.dtype),
            jax.ShapeDtypeStruct((8, wc), jnp.float32),
            jax.ShapeDtypeStruct((8, wc), jnp.float32),
        ],
        interpret=interpret,
    )(x3, g3, scale_l, bias_l, gmap)
    dscale = dsc_p[0].reshape(w, c).sum(0).astype(scale.dtype)
    dbias = dbi_p[0].reshape(w, c).sum(0).astype(bias.dtype)
    return dx3.reshape(orig_shape), dscale, dbias


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
    """custom_vjp wrapper: Pallas forward, Pallas backward (set
    GCP_FUSED_GN_BWD=ref to fall back to the jax.vjp of the jnp reference,
    which recomputes the forward and costs ~2 extra HBM transits)."""
    import os

    @jax.custom_vjp
    def fused(x, scale, bias):
        return _gn_lrelu_pallas(x, scale, bias, num_groups, eps, slope,
                                interpret)

    def fwd(x, scale, bias):
        return fused(x, scale, bias), (x, scale, bias)

    def bwd(res, g):
        # read at trace time, not cache-key time: _make_fused is lru_cached
        ref_bwd = os.environ.get("GCP_FUSED_GN_BWD", "pallas") == "ref"
        x, scale, bias = res
        if not ref_bwd:
            return _gn_lrelu_bwd_pallas(x, g, scale, bias, num_groups, eps,
                                        slope, interpret)
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
