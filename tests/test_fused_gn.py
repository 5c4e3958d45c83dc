"""Fused GroupNorm+LeakyReLU kernel (ops/fused_gn.py).

Validates, on CPU (Pallas interpret mode):
- kernel output vs the pure-jnp reference across dtypes/shapes, including
  ragged grid tails and sublane-padded small spatial levels
- the jnp reference vs stock flax GroupNorm + leaky_relu (bitwise in bf16)
- gradients of the custom_vjp path vs the reference
- the nets.GroupNorm module: checkpoint key compatibility with stock flax
  auto-naming and bitwise fallback parity (GCP_FUSED_GN unset)

Reference parity: torch GroupNorm+LeakyReLU conv blocks
(gcp/prediction/base_gcp.py:78-79 via blox encoder/decoder pyramids).
"""
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_gcp_tpu.models import nets
from video_gcp_tpu.ops.fused_gn import (
    fusable,
    fused_group_norm_lrelu,
    gn_lrelu_reference,
)

KEY = jax.random.PRNGKey(0)

SHAPES = [
    ((5, 16, 16, 64), 8),    # ragged grid tail (N=5)
    ((3, 64, 64, 16), 8),    # bench decode top level
    ((130, 2, 2, 256), 8),   # deep level: tiny spatial, large N
    ((4, 1, 4, 32), 8),      # H=1 sublane padding
]


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 3e-2)])
@pytest.mark.parametrize("shape,groups", SHAPES)
def test_kernel_matches_reference(dtype, tol, shape, groups):
    x = (jax.random.normal(KEY, shape, jnp.float32) * 3 + 1).astype(dtype)
    sc = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],)) * 0.5 + 1
    bi = jax.random.normal(jax.random.PRNGKey(2), (shape[-1],)) * 0.1
    ref = gn_lrelu_reference(x, sc, bi, groups)
    out = fused_group_norm_lrelu(x, sc, bi, groups, interpret=True)
    assert out.dtype == x.dtype
    d = float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                              ref.astype(jnp.float32))))
    assert d < tol, (shape, d)


def test_reference_matches_flax_bitwise():
    x = jax.random.normal(KEY, (4, 8, 8, 32), jnp.float32).astype(jnp.bfloat16)
    gn = nn.GroupNorm(num_groups=8, dtype=jnp.bfloat16)
    p = gn.init(KEY, x)
    want = nn.leaky_relu(gn.apply(p, x), 0.2)
    got = gn_lrelu_reference(x, p["params"]["scale"], p["params"]["bias"], 8)
    assert jnp.array_equal(want, got)


def test_gradients_match_reference():
    def loss_fused(x, sc, bi):
        return jnp.sum(
            fused_group_norm_lrelu(x, sc, bi, 8, interpret=True) ** 2)

    def loss_ref(x, sc, bi):
        return jnp.sum(gn_lrelu_reference(x, sc, bi, 8) ** 2)

    x = jax.random.normal(KEY, (4, 8, 8, 32), jnp.float32)
    sc = jnp.ones((32,))
    bi = jnp.zeros((32,))
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, sc, bi)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, sc, bi)
    for a, b in zip(g1, g2):
        # relative: the Pallas backward's block-partial summation order
        # differs from the reference vjp's single reduction
        scale_mag = max(1.0, float(jnp.max(jnp.abs(b))))
        assert float(jnp.max(jnp.abs(a - b))) / scale_mag < 1e-5


@pytest.mark.parametrize("shape,groups", SHAPES)
def test_pallas_backward_matches_reference_vjp(shape, groups):
    """The single-pass Pallas backward vs jax.vjp of the jnp reference, per
    shape — including the ragged grid tail (N=5), which exercises the
    padded-row masking that protects the dscale/dbias partial sums."""
    x = (jax.random.normal(KEY, shape, jnp.float32) * 2 + 0.5)
    sc = jax.random.normal(jax.random.PRNGKey(3), (shape[-1],)) * 0.5 + 1
    bi = jax.random.normal(jax.random.PRNGKey(4), (shape[-1],)) * 0.1
    g = jax.random.normal(jax.random.PRNGKey(5), shape, jnp.float32)

    _, vjp = jax.vjp(
        lambda xx, ss, bb: gn_lrelu_reference(xx, ss, bb, groups), x, sc, bi)
    want = vjp(g)

    from video_gcp_tpu.ops.fused_gn import _gn_lrelu_bwd_pallas
    got = _gn_lrelu_bwd_pallas(x, g, sc, bi, groups, 1e-6, 0.2, True)
    for a, b, name in zip(got, want, ("dx", "dscale", "dbias")):
        assert a.shape == b.shape and a.dtype == b.dtype, name
        scale_mag = max(1.0, float(jnp.max(jnp.abs(b))))
        d = float(jnp.max(jnp.abs(a - b))) / scale_mag
        assert d < 2e-5, (name, shape, d)


def test_pallas_backward_bf16_through_grad():
    """End-to-end jax.grad through the fused op on bf16 activations matches
    the reference path within bf16 tolerance (the trainers' dtype)."""
    shape, groups = (5, 16, 16, 64), 8
    x = (jax.random.normal(KEY, shape, jnp.float32) * 2).astype(jnp.bfloat16)
    sc = jnp.ones((shape[-1],))
    bi = jnp.zeros((shape[-1],))

    def loss_fused(x, sc, bi):
        y = fused_group_norm_lrelu(x, sc, bi, groups, interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ref(x, sc, bi):
        y = gn_lrelu_reference(x, sc, bi, groups)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, sc, bi)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, sc, bi)
    for a, b, tol in zip(g1, g2, (0.15, 0.5, 0.5)):
        assert a.dtype == b.dtype
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                  b.astype(jnp.float32))))
        assert d < tol, d


def test_fusable_gating():
    assert fusable((2, 64, 64, 16), 8)
    assert not fusable((64, 16), 8)          # not NHWC
    assert not fusable((2, 8, 3, 3), 1)      # lanes not 128-aligned
    assert not fusable((2, 8, 8, 30), 8)     # channels not divisible


class _StockEncoder(nn.Module):
    """ConvEncoder as it was with stock nn.GroupNorm, for ckpt-compat tests."""
    hp: dict

    @nn.compact
    def __call__(self, img):
        import math
        hp = self.hp
        dtype = jnp.bfloat16
        n_levels = int(math.log2(hp["img_sz"]))
        x = img.astype(dtype)
        for i in range(n_levels):
            ch = min(hp["ngf"] * 2 ** i, 256)
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding="SAME",
                        dtype=dtype)(x)
            groups = 8
            while ch % groups:
                groups //= 2
            x = nn.GroupNorm(num_groups=groups, dtype=dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[:-3] + (-1,))
        return nn.Dense(hp["nz_enc"], dtype=dtype)(x).astype(jnp.float32)


def test_module_checkpoint_compat_and_fallback_parity(monkeypatch):
    monkeypatch.delenv("GCP_FUSED_GN", raising=False)
    hp = {"ngf": 16, "img_sz": 64, "nz_enc": 128, "input_nc": 3}
    enc = nets.ConvEncoder(hp, dtype=jnp.bfloat16)
    img = jax.random.normal(KEY, (2, 64, 64, 3), jnp.float32)
    params = enc.init(KEY, img)

    stock = _StockEncoder(hp)
    params_stock = stock.init(KEY, img)
    # identical checkpoint trees: old checkpoints restore into the new module
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_stock)

    e_new, _ = enc.apply(params, img)
    e_stock = stock.apply(params, img)  # stock math on the same params
    assert jnp.array_equal(e_new, e_stock)


def test_module_fused_path_close_to_fallback(monkeypatch):
    hp = {"ngf": 16, "img_sz": 64, "nz_enc": 128, "input_nc": 3}
    enc = nets.ConvEncoder(hp, dtype=jnp.bfloat16)
    img = jax.random.normal(KEY, (2, 64, 64, 3), jnp.float32)
    params = enc.init(KEY, img)
    monkeypatch.delenv("GCP_FUSED_GN", raising=False)
    e_off, _ = enc.apply(params, img)
    monkeypatch.setenv("GCP_FUSED_GN", "1")
    e_on, _ = enc.apply(params, img)
    # bf16 end-to-end through 6 conv levels: one-ulp stat differences compound
    assert float(jnp.max(jnp.abs(e_off - e_on))) < 0.1
