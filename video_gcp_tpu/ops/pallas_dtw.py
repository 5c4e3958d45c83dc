"""Pallas TPU kernel for the soft-DTW (GAK) wavefront DP.

The pure-XLA version (ops.soft_dtw) lowers the diagonal recursion to a
`lax.scan` whose [2B, c]-wide steps each round-trip HBM. This kernel keeps the
entire DP state in VMEM: one grid program per batch element runs the full
r+c-1-step recursion over its diagonalized cost matrix with two VMEM scratch
rows, writing each finished diagonal to the output block. For the flagship
config (511 nodes x 500 frames) the working set is ~2 MB — well inside the
~16 MB VMEM budget — so the recursion becomes compute-bound on the VPU instead
of bandwidth-bound.

Semantics are identical to ops.soft_dtw._gak_scan (validated against it and
the float64 oracle in tests/test_pallas.py). The lane dimension (c) is padded
to a multiple of 128.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_gcp_tpu.ops.soft_dtw import NEG_INF, _diagonalize, _undiagonalize


def _gak_kernel(c_diag_ref, begin_ref, out_ref, prev1_ref, prev2_ref, *,
                n_diag, c_pad, r, c):
    """One batch element: scan diagonals of the 'nohor' log-space DP.

    c_diag_ref: [n_diag, c_pad] diagonalized costs (VMEM block)
    begin_ref:  [1, 1] begin column (SMEM)
    out_ref:    [n_diag, c_pad] accumulated log-values
    prev1/prev2_ref: [1, c_pad] VMEM scratch (diagonals d-1, d-2)
    """
    begin = begin_ref[0, 0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)

    prev1_ref[:] = jnp.full((1, c_pad), NEG_INF, jnp.float32)
    prev2_ref[:] = jnp.full((1, c_pad), NEG_INF, jnp.float32)

    def body(d, _):
        prev1 = prev1_ref[:]
        prev2 = prev2_ref[:]
        # step predecessor (i-1, j-1): diagonal d-2 shifted right by one lane
        pred_step = pltpu.roll(prev2, 1, 1)
        pred_step = jnp.where(col_ids == 0, NEG_INF, pred_step)
        acc = jnp.logaddexp(prev1, pred_step)
        c_row = c_diag_ref[d, :][None, :]
        new_row = c_row + jnp.maximum(acc, NEG_INF)
        # DP source cell (0, begin) on diagonal d == begin
        is_source = (col_ids == begin) & (d == begin)
        new_row = jnp.where(is_source, c_row, new_row)
        # validity: j <= d, d - j <= r - 1, j < c
        valid = (col_ids <= d) & (d - col_ids <= r - 1) & (col_ids < c)
        new_row = jnp.where(valid, new_row, NEG_INF)
        out_ref[d, :] = new_row[0]
        prev2_ref[:] = prev1
        prev1_ref[:] = new_row
        return 0

    jax.lax.fori_loop(0, n_diag, body, 0)


@functools.partial(jax.jit, static_argnames=("r", "c", "interpret"))
def gak_pallas(C_diag: jnp.ndarray, begin_inds: jnp.ndarray,
               r: int, c: int, interpret: bool = False) -> jnp.ndarray:
    """Batched GAK DP over pre-diagonalized costs.

    :param C_diag: [B, n_diag, c] float32.
    :param begin_inds: [B] int32 start columns (row 0).
    :return: [B, n_diag, c] accumulated log-values.
    """
    b, n_diag, _ = C_diag.shape
    c_pad = -(-c // 128) * 128
    padded = jnp.pad(C_diag, ((0, 0), (0, 0), (0, c_pad - c)),
                     constant_values=NEG_INF).astype(jnp.float32)
    begin = begin_inds.astype(jnp.int32).reshape(b, 1, 1)

    kernel = functools.partial(_gak_kernel, n_diag=n_diag, c_pad=c_pad,
                               r=r, c=c)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, n_diag, c_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, n_diag, c_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_diag, c_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, c_pad), jnp.float32),
            pltpu.VMEM((1, c_pad), jnp.float32),
        ],
        interpret=interpret,
    )(padded, begin)
    return out[:, :, :c]


def soft_dtw_pallas(C: jnp.ndarray, end_inds: jnp.ndarray | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.soft_dtw.soft_dtw using the VMEM kernel."""
    C = jax.lax.stop_gradient(C).astype(jnp.float32)
    b, r, c = C.shape
    assert r >= c, "requires at least as many nodes as frames (nohor)"
    if end_inds is None:
        end_inds = jnp.full((b,), c - 1, dtype=jnp.int32)
    end_inds = end_inds.astype(jnp.int32)

    negC = -C
    comb = jnp.concatenate([negC, jnp.flip(negC, axis=(-1, -2))], axis=0)
    comb_begin = jnp.concatenate(
        [jnp.zeros_like(end_inds), c - end_inds - 1], axis=0
    )
    C_diag = _diagonalize(comb)
    rows = gak_pallas(C_diag, comb_begin, r, c, interpret=interpret)
    accum = _undiagonalize(rows, r, c)

    forward = accum[:b]
    backward = jnp.flip(accum[b:], axis=(-1, -2))
    z = jnp.take_along_axis(forward[:, -1, :], end_inds[:, None], axis=1)[
        :, :, None
    ]
    e = forward + backward - negC
    w = jnp.exp(jnp.maximum(e - z, NEG_INF))
    w = jnp.where((forward <= NEG_INF / 2) | (backward <= NEG_INF / 2), 0.0, w)
    return w
