"""Probabilistic soft-DTW: expected node-frame match frequencies on device.

TPU-native reimplementation of the reference's global-alignment-kernel
forward-backward (gcp/prediction/models/adaptive_binding/probabilistic_dtw.py):
given a cost matrix C [B, N_nodes, T_frames] (depth-first node order), computes
the matrix of expected edge frequencies w[b, n, t] — the posterior probability
that node n explains frame t under a monotone alignment where every node
matches exactly one frame ('nohor' transitions) and frames advance montonically.

Design (SURVEY.md §7 hard part 1): the O(N*T) dynamic program is reindexed into
anti-diagonal coordinates — E[d, j] := D[d - j, j] — so the recursion
    D[i, j] = C[i, j] + logaddexp(D[i-1, j], D[i-1, j-1])
becomes a `lax.scan` over d of a fully vectorized [B, T] row update. The 'skip'
predecessor (i-1, j) sits on diagonal d-1 at column j; the 'step' predecessor
(i-1, j-1) sits on diagonal d-2 at column j-1, so the scan carries the previous
two diagonals. The forward and backward passes run in
one scan by batch-concatenating the flipped cost matrix, exactly like the
reference (:103-107). Variable-length sequences enter via per-example
begin indices (backward pass starts at column T - end_ind - 1 of the flipped
matrix).

Numerics: the reference runs in float64 (:92). TPUs have no fast f64, so we run
the log-space DP in float32 and validate against a float64 numpy oracle in
tests/test_ops.py. logaddexp chains of length <= N+T (~750 for the largest
published config) stay well within f32 range in log space.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite stand-in for -inf: avoids (-inf) - (-inf) = nan in jit


def _diagonalize(C: jnp.ndarray) -> jnp.ndarray:
    """Gather anti-diagonals: out[b, d, j] = C[b, d - j, j] (invalid cells
    arbitrary — masked later). C: [B, r, c] -> [B, r + c - 1, c]."""
    b, r, c = C.shape
    d_idx = jnp.arange(r + c - 1)[:, None]  # [D, 1]
    j_idx = jnp.arange(c)[None, :]  # [1, c]
    i_idx = jnp.clip(d_idx - j_idx, 0, r - 1)  # [D, c]
    return C[:, i_idx, j_idx]


def _gak_scan(C_diag: jnp.ndarray, valid: jnp.ndarray, begin_inds: jnp.ndarray):
    """Run the log-space 'nohor' DP over diagonals.

    :param C_diag: [B, D, c] diagonalized costs.
    :param valid: [D, c] bool, True where (d - j, j) is inside the matrix.
    :param begin_inds: [B] start column on row 0 (cell (0, begin) is the DP
        source, reference fast_gak:33).
    :return: [B, D, c] diagonalized accumulated log-values.
    """
    b, n_diag, c = C_diag.shape
    j_idx = jnp.arange(c)

    # source cell (0, begin) lies on diagonal d == begin at column begin
    begin_mask = (j_idx[None, :] == begin_inds[:, None])  # [B, c]

    def step(carry, inputs):
        prev1, prev2 = carry  # diagonals d-1 and d-2
        c_row, valid_row, d = inputs
        pred_skip = prev1  # (i-1, j) on diag d-1, col j
        pred_step = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF, prev2.dtype), prev2[:, :-1]], axis=1
        )  # (i-1, j-1) on diag d-2, col j-1
        acc = jnp.logaddexp(pred_skip, pred_step)
        new_row = c_row + jnp.maximum(acc, NEG_INF)  # keep finite
        # the DP source: D[0, begin] = C[0, begin], overriding the recursion
        is_source = begin_mask & (begin_inds[:, None] == d)
        new_row = jnp.where(is_source, c_row, new_row)
        new_row = jnp.where(valid_row[None, :], new_row, NEG_INF)
        return (new_row, prev1), new_row

    init_row = jnp.full((b, c), NEG_INF, C_diag.dtype)
    ds = jnp.arange(n_diag)
    _, rows = jax.lax.scan(
        step, (init_row, init_row), (C_diag.transpose(1, 0, 2), valid, ds)
    )
    return rows.transpose(1, 0, 2)  # [B, D, c]


def _undiagonalize(E: jnp.ndarray, r: int, c: int) -> jnp.ndarray:
    """Inverse of _diagonalize: out[b, i, j] = E[b, i + j, j]."""
    i_idx = jnp.arange(r)[:, None]
    j_idx = jnp.arange(c)[None, :]
    return E[:, i_idx + j_idx, j_idx]


def soft_dtw(C: jnp.ndarray, end_inds: jnp.ndarray | None = None,
             backend: str = "auto") -> jnp.ndarray:
    """Expected edge frequencies of the monotone alignment posterior.

    :param C: [B, r, c] cost matrix (df nodes x frames), finite values.
        The caller is responsible for temperature scaling and detaching
        (reference adaptive.py:50-51 — no gradient flows through the DTW).
    :param end_inds: [B] last valid frame index per example (frames beyond it
        are excluded from the alignment); defaults to c - 1.
    :param backend: 'auto' uses the Pallas VMEM kernel on TPU and the XLA scan
        elsewhere; 'xla' / 'pallas' force a choice.
    :return: [B, r, c] float32 w with w[b].sum(axis=1) ~= 1 over valid frames.
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from video_gcp_tpu.ops.pallas_dtw import soft_dtw_pallas

        return soft_dtw_pallas(C, end_inds)
    C = jax.lax.stop_gradient(C).astype(jnp.float32)
    b, r, c = C.shape
    assert r >= c, "requires at least as many nodes as frames (nohor transitions)"
    if end_inds is None:
        end_inds = jnp.full((b,), c - 1, dtype=jnp.int32)
    end_inds = end_inds.astype(jnp.int32)

    negC = -C
    # forward starts at (0, 0); backward runs on the doubly-flipped matrix and
    # starts at column c - end - 1 (reference soft_dtw:103-107)
    comb = jnp.concatenate([negC, jnp.flip(negC, axis=(-1, -2))], axis=0)
    comb_begin = jnp.concatenate(
        [jnp.zeros_like(end_inds), c - end_inds - 1], axis=0
    )

    d_idx = jnp.arange(r + c - 1)[:, None]
    j_idx = jnp.arange(c)[None, :]
    valid = (j_idx <= d_idx) & (d_idx - j_idx <= r - 1)

    C_diag = _diagonalize(comb)
    rows = _gak_scan(C_diag, valid, comb_begin)
    accum = _undiagonalize(rows, r, c)

    forward = accum[:b]
    backward = jnp.flip(accum[b:], axis=(-1, -2))

    # partition function: forward value at (r-1, end_ind)
    z = jnp.take_along_axis(forward[:, -1, :], end_inds[:, None], axis=1)[
        :, :, None
    ]
    e = forward + backward - negC
    w = jnp.exp(jnp.maximum(e - z, NEG_INF))
    # zero out anything outside the valid alignment region
    w = jnp.where((forward <= NEG_INF / 2) | (backward <= NEG_INF / 2), 0.0, w)
    return w


def soft_dtw_stability_gap(w: jnp.ndarray, end_inds: jnp.ndarray) -> jnp.ndarray:
    """max |w.sum(over frames) - 1| over nodes — the reference's runtime
    stability check (probabilistic_dtw.py:118-120), exposed for debug hooks."""
    sums = jnp.sum(w, axis=2)
    return jnp.max(jnp.abs(sums - 1.0))
