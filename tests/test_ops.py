"""Golden-value tests for tree index math, cdist, soft-DTW and eval DTW.

Oracles are float64 numpy reimplementations of the reference formulas
(gcp/prediction/utils/tree_utils.py, probabilistic_dtw.py,
gcp/evaluation/dtw_utils.py) — generalizing the reference's own dtw_utils
__main__ self-check (SURVEY.md §4) into pytest.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from video_gcp_tpu.ops import (
    balanced_timesteps,
    batch_cdist,
    batched_dtw_alignment,
    bf2df_perm,
    depthfirst2breadthfirst,
    depthfirst2layers,
    df2bf_perm,
    interleave,
    min_cumsum,
    soft_dtw,
)
from video_gcp_tpu.ops.dtw import dtw_warp_sequence


# ---------------------------------------------------------------------------
# numpy oracles
# ---------------------------------------------------------------------------

def np_df_order(depth):
    """In-order traversal producing bf indices in df order."""
    order = []

    def rec(bf_idx, d):
        if d == depth:
            return
        rec(2 * bf_idx + 1, d + 1)
        order.append(bf_idx)
        rec(2 * bf_idx + 2, d + 1)

    rec(0, 0)
    return np.array(order)


def np_fast_gak(C, begin_inds):
    """Reference fast_gak oracle in float64 (probabilistic_dtw.py:11-73)."""
    b, r, c = C.shape
    D = np.full_like(C, -np.inf)
    for k in range(b):
        D[k, 0, begin_inds[k]] = C[k, 0, begin_inds[k]]
    for i in range(1, r + c):
        ids = np.arange(i + 1)[::-1]
        jds = np.arange(i + 1)
        sel = slice(max(0, i - r + 1), c)
        ids, jds = ids[sel], jds[sel]
        ids, jds = ids[::-1], jds[::-1]
        skip = D[:, ids - 1, jds]
        step = D[:, ids - 1, jds - 1]
        with np.errstate(over="ignore", invalid="ignore"):
            add = np.logaddexp(skip, step)
        new_cost = C[:, ids, jds] + add
        mask = D[:, ids, jds] != -np.inf
        new_cost[mask] = D[:, ids, jds][mask]
        D[:, ids, jds] = new_cost
    return D


def np_soft_dtw(C, end_inds):
    """Reference soft_dtw oracle (probabilistic_dtw.py:82-122)."""
    C = (-C).astype(np.float64)
    batch, r, c = C.shape
    comb_C = np.concatenate([C, C[:, ::-1, ::-1]], 0)
    comb_begin = np.concatenate([np.zeros_like(end_inds), c - end_inds - 1], 0)
    accum = np_fast_gak(comb_C, comb_begin)
    forward = accum[:batch]
    backward = accum[batch:][:, ::-1, ::-1]
    z = forward[np.arange(batch), -1, end_inds][:, None, None]
    e = forward + backward - C
    with np.errstate(invalid="ignore"):
        w = np.exp(e - z)
    w[~np.isfinite(e)] = 0.0
    return w


def np_basic_dtw_D(C):
    """Reference basic_dtw accumulated matrix (dtw_utils.py:77-97)."""
    r, c = C.shape
    D = np.zeros((r + 1, c + 1))
    D[0, 1:] = np.inf
    D[1:, 0] = np.inf
    D[1:, 1:] = C
    for i in range(r):
        for j in range(c):
            D[i + 1, j + 1] += min(D[i, j], D[i + 1, j], D[i, j + 1])
    return D


def np_traceback(D):
    i, j = np.array(D.shape) - 2
    p, q = [i], [j]
    while (i > 0) or (j > 0):
        tb = np.argmin((D[i, j], D[i, j + 1], D[i + 1, j]))
        if tb == 0:
            i -= 1
            j -= 1
        elif tb == 1:
            i -= 1
        else:
            j -= 1
        p.insert(0, i)
        q.insert(0, j)
    return np.array(p), np.array(q)


# ---------------------------------------------------------------------------
# tree index tests
# ---------------------------------------------------------------------------

class TestTreeIndex:
    @pytest.mark.parametrize("depth", [1, 2, 3, 5, 8])
    def test_df2bf_perm_matches_inorder(self, depth):
        np.testing.assert_array_equal(df2bf_perm(depth), np_df_order(depth))

    @pytest.mark.parametrize("depth", [2, 4, 7])
    def test_perms_inverse(self, depth):
        f, b = df2bf_perm(depth), bf2df_perm(depth)
        np.testing.assert_array_equal(f[b], np.arange(2 ** depth - 1))

    def test_depthfirst2breadthfirst(self):
        depth = 3
        df = jnp.asarray(np_df_order(depth))[None]  # df array whose values=bf idx
        bf = depthfirst2breadthfirst(df)
        np.testing.assert_array_equal(np.array(bf[0]), np.arange(7))

    def test_depthfirst2layers(self):
        depth = 3
        df = jnp.asarray(np_df_order(depth))[None]
        layers = depthfirst2layers(df)
        np.testing.assert_array_equal(np.array(layers[0][0]), [0])
        np.testing.assert_array_equal(np.array(layers[1][0]), [1, 2])
        np.testing.assert_array_equal(np.array(layers[2][0]), [3, 4, 5, 6])

    def test_interleave(self):
        a = jnp.array([[1, 3, 5]])
        b = jnp.array([[2, 4, 6]])
        np.testing.assert_array_equal(np.array(interleave(a, b)[0]), [1, 2, 3, 4, 5, 6])

    def test_balanced_timesteps_matches_recursion(self):
        depth, E = 3, 9

        def rec(lo, hi, d, out):
            if d == depth:
                return
            mid = (lo + hi) / 2
            out.append((d, mid))
            rec(lo, mid, d + 1, out)
            rec(mid, hi, d + 1, out)

        out = []
        rec(-1.0, E + 1.0, 0, out)
        # bf order: sort by level, stable within level by recursion order =
        # left-to-right
        bf_expected = [t for d in range(depth) for (dd, t) in out if dd == d]
        got = balanced_timesteps(depth, jnp.array([E]))[0]
        np.testing.assert_allclose(np.array(got), bf_expected, rtol=1e-6)


# ---------------------------------------------------------------------------
# cdist
# ---------------------------------------------------------------------------

class TestCdist:
    def test_matches_naive(self):
        rng = np.random.RandomState(0)
        a = rng.rand(2, 4, 3, 5).astype(np.float32)
        b = rng.rand(2, 6, 3, 5).astype(np.float32)
        naive = ((a[:, :, None] - b[:, None]) ** 2).sum(axis=(-1, -2))
        got = batch_cdist(jnp.asarray(a), jnp.asarray(b), reduction="sum")
        np.testing.assert_allclose(np.array(got), naive, rtol=1e-4, atol=1e-4)

    def test_mean_reduction(self):
        rng = np.random.RandomState(1)
        a = rng.rand(1, 3, 8).astype(np.float32)
        b = rng.rand(1, 5, 8).astype(np.float32)
        naive = ((a[:, :, None] - b[:, None]) ** 2).mean(-1)
        got = batch_cdist(jnp.asarray(a), jnp.asarray(b), reduction="mean")
        np.testing.assert_allclose(np.array(got), naive, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# soft-DTW
# ---------------------------------------------------------------------------

class TestSoftDTW:
    @pytest.mark.parametrize("seed,r,c", [(0, 7, 5), (1, 15, 9), (2, 31, 20)])
    def test_matches_float64_oracle(self, seed, r, c):
        rng = np.random.RandomState(seed)
        b = 3
        C = rng.rand(b, r, c).astype(np.float32) * 2.0
        end_inds = np.array([c - 1, c - 2, max(c - 3, 1)])
        want = np_soft_dtw(C, end_inds)
        got = np.array(soft_dtw(jnp.asarray(C), jnp.asarray(end_inds)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_rows_sum_to_one(self):
        rng = np.random.RandomState(3)
        C = rng.rand(2, 15, 10).astype(np.float32)
        end_inds = jnp.array([9, 7])
        w = np.array(soft_dtw(jnp.asarray(C), end_inds))
        sums = w.sum(2)
        np.testing.assert_allclose(sums, 1.0, atol=1e-2)

    def test_no_mass_past_end(self):
        rng = np.random.RandomState(4)
        C = rng.rand(1, 7, 6).astype(np.float32)
        w = np.array(soft_dtw(jnp.asarray(C), jnp.array([3])))
        assert np.abs(w[0, :, 4:]).max() < 1e-6


# ---------------------------------------------------------------------------
# eval DTW
# ---------------------------------------------------------------------------

class TestEvalDTW:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_min_cumsum_matches_oracle(self, seed):
        rng = np.random.RandomState(seed)
        C = rng.rand(3, 12, 8).astype(np.float32)
        got = np.array(min_cumsum(jnp.asarray(C)))
        for k in range(3):
            want = np_basic_dtw_D(C[k].astype(np.float64))
            np.testing.assert_allclose(got[k], want, rtol=1e-4, atol=1e-4)

    def test_alignment_matches_reference_pipeline(self):
        rng = np.random.RandomState(7)
        b, r, c = 2, 10, 6
        C = rng.rand(b, r, c).astype(np.float32)
        end_inds = np.array([c - 1, c - 1])
        inds, dist = batched_dtw_alignment(jnp.asarray(C), jnp.asarray(end_inds))
        for k in range(b):
            D = np_basic_dtw_D(C[k].astype(np.float64))
            path = np_traceback(D)
            match = np.full((r, c), np.inf)
            match[path[0], path[1]] = D[1:, 1:][path[0], path[1]]
            want_inds = np.argmin(match, axis=0)
            np.testing.assert_array_equal(np.array(inds[k]), want_inds)
            want_dist = D[-1, -1] / (r + c)
            np.testing.assert_allclose(float(dist[k]), want_dist, rtol=1e-4)

    def test_variable_length(self):
        rng = np.random.RandomState(8)
        b, r, c = 2, 9, 7
        C = rng.rand(b, r, c).astype(np.float32)
        end_inds = np.array([4, 6])
        inds, dist = batched_dtw_alignment(jnp.asarray(C), jnp.asarray(end_inds))
        # example 0: oracle on the sliced matrix
        D = np_basic_dtw_D(C[0, :, :5].astype(np.float64))
        path = np_traceback(D)
        match = np.full((r, 5), np.inf)
        match[path[0], path[1]] = D[1:, 1:][path[0], path[1]]
        want = np.argmin(match, axis=0)
        np.testing.assert_array_equal(np.array(inds[0, :5]), want)
        # repeated last match past end
        assert np.all(np.array(inds[0, 5:]) == np.array(inds[0, 4]))

    def test_warp_sequence_shapes(self):
        rng = np.random.RandomState(9)
        est = jnp.asarray(rng.rand(2, 7, 4, 4, 3).astype(np.float32))
        tgt = jnp.asarray(rng.rand(2, 5, 4, 4, 3).astype(np.float32))
        warped, inds = dtw_warp_sequence(est, tgt, jnp.array([4, 4]))
        assert warped.shape == (2, 5, 4, 4, 3)
        assert inds.shape == (2, 5)
