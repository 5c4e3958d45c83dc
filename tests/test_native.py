"""Native C++ DTW library: correctness vs numpy oracle and device kernel."""
import numpy as np
import pytest

from video_gcp_tpu.native.dtw import (
    batched_dtw_alignment,
    min_cumsum,
    native_available,
)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
class TestNativeDTW:
    def test_min_cumsum_matches_oracle(self):
        rng = np.random.RandomState(0)
        C = rng.rand(3, 12, 8)
        D = min_cumsum(C)

        def oracle(Ck):
            r, c = Ck.shape
            M = np.zeros((r + 1, c + 1))
            M[0, 1:] = np.inf
            M[1:, 0] = np.inf
            M[1:, 1:] = Ck
            for i in range(r):
                for j in range(c):
                    M[i + 1, j + 1] += min(M[i, j], M[i + 1, j], M[i, j + 1])
            return M

        for k in range(3):
            np.testing.assert_allclose(D[k], oracle(C[k]))

    def test_alignment_matches_device_kernel(self):
        import jax.numpy as jnp

        from video_gcp_tpu.ops.dtw import batched_dtw_alignment as dev_align

        rng = np.random.RandomState(1)
        C = rng.rand(4, 15, 9).astype(np.float32)
        end = np.array([8, 8, 5, 3])
        inds, dist = batched_dtw_alignment(C, end)
        di, dd = dev_align(jnp.asarray(C), jnp.asarray(end))
        np.testing.assert_array_equal(np.array(di), inds)
        np.testing.assert_allclose(np.array(dd), dist, rtol=1e-5)
