"""Model-level tests: init/forward/loss/grad for both predictor families.

Covers the published config surface (SURVEY.md §2.2-2.6): balanced tree with
TreeLSTM + aux models, adaptive (soft-DTW) tree with attentive inference,
sequential VRNN, and prior-mode sampling.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_gcp_tpu.core import AttrDict
from video_gcp_tpu.models.hyperparameters import default_hparams
from video_gcp_tpu.models.sequential import SequentialModel
from video_gcp_tpu.models.tree import TreeModel

B, T, H = 2, 10, 16
KEY = jax.random.PRNGKey(0)


def make_inputs(with_aux=False):
    rng = np.random.RandomState(0)
    inputs = AttrDict(
        traj_seq=jnp.asarray(rng.rand(B, T, H, H, 3).astype(np.float32) * 2 - 1),
        pad_mask=jnp.ones((B, T), jnp.float32),
        end_ind=jnp.array([9, 7]),
        start_ind=jnp.zeros((B,), jnp.int32),
    )
    if with_aux:
        inputs.traj_seq_states = jnp.asarray(rng.rand(B, T, 2).astype(np.float32))
        inputs.actions = jnp.asarray(rng.rand(B, T - 1, 2).astype(np.float32))
    inputs.I_0 = inputs.traj_seq[:, 0]
    inputs.I_g = inputs.traj_seq[:, -1]
    return inputs


def build(model_cls, **overrides):
    hp = default_hparams()
    hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H))
    hp.overwrite(overrides)
    return model_cls(hp=dict(hp))


class TestBalancedTree:
    @pytest.fixture(scope="class")
    def setup(self):
        model = build(
            TreeModel, hierarchy_levels=3, matching_type="balanced",
            regress_length=True, attach_state_regressor=True, state_dim=2,
            attach_inv_mdl=True, inv_mdl_params=dict(n_actions=2),
            attach_cost_mdl=True, n_actions=2, tree_lstm="split_linear",
            lstm_init="mlp", seq_enc="conv",
        )
        inputs = make_inputs(with_aux=True)
        params = jax.jit(
            lambda i: model.init({"params": KEY, "sample": KEY}, i, "train", "posterior")
        )(inputs)
        return model, params, inputs

    def test_forward_shapes_and_losses(self, setup):
        model, params, inputs = setup
        out = jax.jit(
            lambda p, i: model.apply(p, i, "train", "posterior", rngs={"sample": KEY})
        )(params, inputs)
        assert out.tree.images.shape == (B, 7, H, H, 3)
        assert out.tree.e_g_prime.shape[1] == 7
        for name in ["dense_img_rec", "kl", "seq_len", "action_reconst",
                     "cost_estimation", "state_regression",
                     "existence_predictor", "total"]:
            assert name in out.losses, name
            assert np.isfinite(float(out.losses[name].value)), name

    def test_balanced_match_one_hot(self, setup):
        model, params, inputs = setup
        out = jax.jit(
            lambda p, i: model.apply(p, i, "train", "posterior", rngs={"sample": KEY})
        )(params, inputs)
        w = np.array(out.gt_match_dists)
        # each node matches at most one frame, exactly one-hot rows
        sums = w.sum(-1)
        assert np.all((sums == 0) | (sums == 1))
        # root of example 0 (end=9) matches trunc((9)/2) = 4
        assert w[0, 0].argmax() == 4

    def test_grad_finite(self, setup):
        model, params, inputs = setup

        def loss_fn(p):
            o = model.apply(p, inputs, "train", "posterior", rngs={"sample": KEY})
            return o.losses.total.value

        g = jax.jit(jax.grad(loss_fn))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)
        assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0

    def test_prior_mode_no_losses(self, setup):
        model, params, inputs = setup
        out = jax.jit(
            lambda p, i: model.apply(p, i, "test", "prior", rngs={"sample": KEY})
        )(params, inputs)
        assert len(out.losses) == 0
        assert out.tree.images.shape == (B, 7, H, H, 3)
        assert out.prune_keep.shape == (B, 7)

    def test_injected_z_deterministic(self, setup):
        """Planner path: injected z makes the rollout deterministic."""
        model, params, inputs = setup
        z = jnp.zeros((B, 7, 32))
        i2 = inputs.copy()
        i2.z = z
        f = jax.jit(
            lambda p, i: model.apply(p, i, "test", "prior", rngs={"sample": KEY})
        )
        o1 = f(params, i2)
        o2 = model.apply(params, i2, "test", "prior",
                         rngs={"sample": jax.random.PRNGKey(99)})
        np.testing.assert_allclose(
            np.array(o1.tree.images), np.array(o2.tree.images), atol=1e-5
        )


class TestAdaptiveTree:
    @pytest.fixture(scope="class")
    def setup(self):
        model = build(
            TreeModel, hierarchy_levels=4, matching_type="dtw_image",
            attentive_inference=True, learn_matching_temp=False,
            seq_enc="conv", tree_lstm="sum",
        )
        inputs = make_inputs()
        params = jax.jit(
            lambda i: model.init({"params": KEY, "sample": KEY}, i, "train", "posterior")
        )(inputs)
        return model, params, inputs

    def test_forward_and_match(self, setup):
        model, params, inputs = setup
        out = jax.jit(
            lambda p, i: model.apply(p, i, "train", "posterior", rngs={"sample": KEY})
        )(params, inputs)
        assert out.tree.images.shape == (B, 15, H, H, 3)
        w = np.array(out.gt_match_dists)
        # frames up to end_ind have a normalized node distribution
        np.testing.assert_allclose(w[0].sum(0)[:10], 1.0, atol=1e-3)
        np.testing.assert_allclose(w[1].sum(0)[:8], 1.0, atol=1e-3)
        np.testing.assert_allclose(w[1].sum(0)[8:], 0.0, atol=1e-5)
        assert "distance_predictor" in out.losses
        assert np.isfinite(float(out.losses.total.value))


class TestSequential:
    def test_forward_and_losses(self):
        model = build(SequentialModel, hierarchy_levels=0)
        inputs = make_inputs()
        params = jax.jit(
            lambda i: model.init({"params": KEY, "sample": KEY}, i, "train", "posterior")
        )(inputs)
        out = jax.jit(
            lambda p, i: model.apply(p, i, "train", "posterior", rngs={"sample": KEY})
        )(params, inputs)
        assert out.dense_rec.images.shape == (B, T, H, H, 3)
        # first frame is GT I_0
        np.testing.assert_allclose(
            np.array(out.dense_rec.images[:, 0]), np.array(inputs.I_0)
        )
        assert np.isfinite(float(out.losses.total.value))
        assert "kl" in out.losses and "dense_img_rec" in out.losses
