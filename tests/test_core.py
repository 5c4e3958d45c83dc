import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_gcp_tpu.core import AttrDict, ParamDict, batch_apply
from video_gcp_tpu.core.distributions import Gaussian, safe_entropy, unit_gaussian
from video_gcp_tpu.core.losses import (
    bce_logits_loss,
    ce_logits_loss,
    kl_divergence_loss,
    l2_loss,
    total_loss,
)
from video_gcp_tpu.core.metrics import mse, psnr, ssim
from video_gcp_tpu.core.schedules import exponential_decay, linear_ramp


class TestAttrDict:
    def test_attribute_access(self):
        d = AttrDict(a=1)
        d.b = 2
        assert d.a == 1 and d["b"] == 2

    def test_pytree_roundtrip(self):
        d = AttrDict(x=jnp.ones(3), nested=AttrDict(y=jnp.zeros(2)))
        leaves, treedef = jax.tree_util.tree_flatten(d)
        d2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert isinstance(d2, AttrDict) and isinstance(d2.nested, AttrDict)
        np.testing.assert_array_equal(d2.x, d.x)

    def test_jit_through(self):
        @jax.jit
        def f(d):
            return AttrDict(z=d.x * 2)

        out = f(AttrDict(x=jnp.arange(4.0)))
        np.testing.assert_allclose(out.z, [0, 2, 4, 6])

    def test_batch_apply(self):
        x = jnp.arange(24.0).reshape(2, 3, 4)

        def fn(v):
            assert v.shape == (6, 4)
            return v * 2

        out = batch_apply(fn, x)
        assert out.shape == (2, 3, 4)
        np.testing.assert_allclose(out, x * 2)


class TestParamDict:
    def test_override_unknown_raises(self):
        p = ParamDict(a=1)
        with pytest.raises(KeyError):
            p.override({"b": 2})

    def test_override_equal_default_raises(self):
        p = ParamDict(a=1)
        with pytest.raises(ValueError):
            p.override({"a": 1})

    def test_override_ok(self):
        p = ParamDict(a=1)
        p.override({"a": 2})
        assert p.a == 2


class TestGaussian:
    def test_kl_standard_normal(self):
        g = Gaussian(mu=jnp.zeros(5), log_sigma=jnp.zeros(5))
        kl = g.kl_divergence(unit_gaussian((5,)))
        np.testing.assert_allclose(kl, 0.0, atol=1e-6)

    def test_kl_analytic(self):
        q = Gaussian(mu=jnp.array([1.0]), log_sigma=jnp.array([0.5]))
        p = unit_gaussian((1,))
        expected = -0.5 + (np.exp(1.0) + 1.0) / 2.0 - 0.5
        np.testing.assert_allclose(q.kl_divergence(p)[0], expected, rtol=1e-5)

    def test_sample_reparam(self):
        g = Gaussian(mu=jnp.full((3,), 2.0), log_sigma=jnp.full((3,), -10.0))
        s = g.sample(jax.random.PRNGKey(0))
        np.testing.assert_allclose(s, 2.0, atol=1e-3)

    def test_entropy_of_uniform(self):
        p = jnp.full((4,), 0.25)
        np.testing.assert_allclose(safe_entropy(p), np.log(4), rtol=1e-5)


class TestLosses:
    def test_l2_matches_manual(self):
        pred = jnp.array([[1.0, 2.0], [3.0, 4.0]])
        target = jnp.zeros((2, 2))
        term = l2_loss(pred, target)
        np.testing.assert_allclose(term.value, (1 + 4 + 9 + 16) / 2, rtol=1e-6)

    def test_kl_free_nats_floor(self):
        q = Gaussian(mu=jnp.zeros((2, 3)), log_sigma=jnp.zeros((2, 3)))
        p = unit_gaussian((2, 3))
        term = kl_divergence_loss(q, p, free_nats_per_dim=0.1)
        np.testing.assert_allclose(term.value, 0.3, rtol=1e-5)

    def test_bce_matches_manual(self):
        logits = jnp.array([[0.0, 100.0, -100.0]])
        targets = jnp.array([[0.0, 1.0, 0.0]])
        term = bce_logits_loss(logits, targets)
        np.testing.assert_allclose(term.value, np.log(2), atol=1e-4)

    def test_ce_loss(self):
        logits = jnp.array([[10.0, 0.0, 0.0]])
        term = ce_logits_loss(logits, jnp.array([0]))
        assert term.value < 0.01

    def test_total_loss_weighting(self):
        losses = AttrDict(
            a=l2_loss(jnp.ones((1, 4)), jnp.zeros((1, 4)), weight=2.0),
            logonly=l2_loss(jnp.ones((1, 4)), jnp.zeros((1, 4)), weight=0.0),
        )
        tot = total_loss(losses, per_example_numel=4)
        np.testing.assert_allclose(tot, 2.0, rtol=1e-6)


class TestMetrics:
    def test_psnr_identical(self):
        img = jnp.zeros((2, 8, 8, 3))
        assert jnp.all(psnr(img, img) > 90)

    def test_mse_known(self):
        a = jnp.full((1, 4, 4, 1), -1.0)  # maps to 0
        b = jnp.full((1, 4, 4, 1), 1.0)  # maps to 1
        np.testing.assert_allclose(mse(a, b), 1.0)

    def test_ssim_range(self):
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.rand(2, 16, 16, 3) * 2 - 1)
        s_same = ssim(a, a)
        np.testing.assert_allclose(s_same, 1.0, atol=1e-4)
        b = jnp.asarray(rng.rand(2, 16, 16, 3) * 2 - 1)
        s_diff = ssim(a, b)
        assert jnp.all(s_diff < 0.9)

    def test_batched_leading_axes(self):
        a = jnp.zeros((5, 2, 8, 8, 3))
        assert ssim(a, a).shape == (5, 2)
        assert psnr(a, a).shape == (5, 2)


class TestSchedules:
    def test_linear_ramp(self):
        np.testing.assert_allclose(linear_ramp(50, 100, 1.0), 0.5)
        np.testing.assert_allclose(linear_ramp(200, 100, 1.0), 1.0)

    def test_exponential_decay_tenthlife(self):
        np.testing.assert_allclose(
            exponential_decay(100, 1.0, tenthlife=100), 0.1, rtol=1e-5
        )
        np.testing.assert_allclose(
            exponential_decay(10000, 1.0, tenthlife=100, min_limit=1e-3), 1e-3
        )
