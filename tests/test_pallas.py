"""Pallas soft-DTW kernel: interpret-mode equivalence with the XLA scan and
the float64 oracle (the compiled path is exercised on real TPU by bench/eval)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_gcp_tpu.ops.pallas_dtw import soft_dtw_pallas
from video_gcp_tpu.ops.soft_dtw import soft_dtw


class TestPallasSoftDTW:
    @pytest.mark.parametrize("seed,r,c", [(0, 31, 20), (1, 15, 9)])
    def test_matches_xla_scan(self, seed, r, c):
        rng = np.random.RandomState(seed)
        C = jnp.asarray(rng.rand(3, r, c).astype(np.float32) * 2)
        end = jnp.asarray([c - 1, c - 2, max(c // 2, 1)])
        w_ref = soft_dtw(C, end, backend="xla")
        w_pal = soft_dtw_pallas(C, end, interpret=True)
        np.testing.assert_allclose(np.array(w_pal), np.array(w_ref), atol=1e-4)

    def test_row_sums(self):
        rng = np.random.RandomState(2)
        C = jnp.asarray(rng.rand(2, 15, 10).astype(np.float32))
        w = soft_dtw_pallas(C, jnp.array([9, 7]), interpret=True)
        sums = np.array(w.sum(2))
        np.testing.assert_allclose(sums, 1.0, atol=1e-2)

    def test_backend_dispatch_cpu_uses_xla(self):
        # on CPU, 'auto' must not require the Pallas TPU path
        rng = np.random.RandomState(3)
        C = jnp.asarray(rng.rand(1, 7, 5).astype(np.float32))
        w = soft_dtw(C, jnp.array([4]), backend="auto")
        assert np.isfinite(np.array(w)).all()
