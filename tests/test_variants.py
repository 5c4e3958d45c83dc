"""Model-variant tests: discrete-logistic-mixture decoder, behavioral cloning,
action-conditioned VMPC (nz_vae=0 deterministic inference)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_gcp_tpu.core import AttrDict
from video_gcp_tpu.models.hyperparameters import default_hparams

B, T, H = 2, 8, 16
KEY = jax.random.PRNGKey(0)


def make_inputs():
    rng = np.random.RandomState(0)
    inputs = AttrDict(
        traj_seq=jnp.asarray(rng.rand(B, T, H, H, 3).astype(np.float32) * 2 - 1),
        actions=jnp.asarray(rng.rand(B, T - 1, 2).astype(np.float32)),
        pad_mask=jnp.ones((B, T), jnp.float32),
        end_ind=jnp.array([T - 1, T - 2]),
        start_ind=jnp.zeros((B,), jnp.int32),
    )
    inputs.I_0 = inputs.traj_seq[:, 0]
    inputs.I_g = inputs.traj_seq[:, -1]
    return inputs


class TestDLM:
    def test_nll_favors_correct_target(self):
        from video_gcp_tpu.models import dlm

        rng = np.random.RandomState(0)
        target = jnp.asarray(rng.rand(1, 4, 4, 3).astype(np.float32) * 2 - 1)
        raw = np.zeros((1, 4, 4, dlm.n_dlm_channels(3)), np.float32)
        # means parameterized pre-tanh; set first mixture means to atanh(target)
        raw[..., dlm.N_MIX : dlm.N_MIX + 3 * dlm.N_MIX] = np.tile(
            np.arctanh(np.asarray(target) * 0.99), (1, 1, 1, dlm.N_MIX)
        )
        raw[..., -3 * dlm.N_MIX :] = -4.0  # tight scales
        nll_good = float(dlm.nll(jnp.asarray(raw), target).mean())
        nll_bad = float(dlm.nll(jnp.asarray(raw), -target).mean())
        assert nll_good < nll_bad

    def test_tree_dlm_end_to_end(self):
        from video_gcp_tpu.models.tree import TreeModel

        hp = default_hparams()
        hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H,
                          hierarchy_levels=3, matching_type="balanced",
                          decoder_distribution="discrete_logistic_mixture"))
        m = TreeModel(hp=dict(hp))
        inputs = make_inputs()
        p = jax.jit(lambda i: m.init({"params": KEY, "sample": KEY}, i,
                                     "train", "posterior"))(inputs)
        out = jax.jit(lambda p, i: m.apply(p, i, "train", "posterior",
                                           rngs={"sample": KEY}))(p, inputs)
        assert out.tree.images.shape == (B, 7, H, H, 3)
        assert float(out.tree.images.max()) <= 1.0
        assert np.isfinite(float(out.losses.total.value))


class TestBC:
    def test_train_and_act(self):
        from video_gcp_tpu.models.bc import BCModel

        hp = default_hparams()
        hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H, n_actions=2))
        bc = BCModel(hp=dict(hp))
        inputs = make_inputs()
        p = jax.jit(lambda i: bc.init({"params": KEY, "sample": KEY}, i,
                                      "train", "posterior"))(inputs)
        out = jax.jit(lambda p, i: bc.apply(p, i, "train", "posterior",
                                            rngs={"sample": KEY}))(p, inputs)
        assert out.actions.shape == (B, T - 1, 2)
        assert np.isfinite(float(out.losses.total.value))
        act, hidden = bc.apply(p, inputs.I_0, inputs.I_g, None,
                               method=BCModel.act_single)
        assert act.shape == (B, 2)


class TestVMPC:
    def test_action_conditioned_zero_latent(self):
        from video_gcp_tpu.models.sequential import SequentialModel

        hp = default_hparams()
        hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H,
                          hierarchy_levels=0, action_conditioned_pred=True,
                          non_goal_conditioned=True, nz_vae=0,
                          var_inf="deterministic", n_actions=2))
        vm = SequentialModel(hp=dict(hp))
        inputs = make_inputs()
        p = jax.jit(lambda i: vm.init({"params": KEY, "sample": KEY}, i,
                                      "train", "posterior"))(inputs)
        out = jax.jit(lambda p, i: vm.apply(p, i, "train", "posterior",
                                            rngs={"sample": KEY}))(p, inputs)
        assert out.dense_rec.images.shape == (B, T, H, H, 3)
        # zero KL: q == p == empty gaussian
        assert float(out.losses.kl.value) == 0.0


class TestHparamVariants:
    """Every declared hparam must work or fail loudly (config hygiene)."""

    def test_conv_lstm_tree(self):
        from video_gcp_tpu.models.tree import TreeModel

        hp = default_hparams()
        hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H,
                          hierarchy_levels=3, matching_type="balanced",
                          tree_lstm="split_linear", lstm_init="mlp",
                          use_conv_lstm=True))
        m = TreeModel(hp=dict(hp))
        inputs = make_inputs()
        p = jax.jit(lambda i: m.init({"params": KEY, "sample": KEY}, i,
                                     "train", "posterior"))(inputs)
        out = jax.jit(lambda p, i: m.apply(p, i, "train", "posterior",
                                           rngs={"sample": KEY}))(p, inputs)
        assert out.tree.images.shape == (B, 7, H, H, 3)
        assert np.isfinite(float(out.losses.total.value))

    def test_conv_lstm_sequential_with_action_regression(self):
        from video_gcp_tpu.models.sequential import SequentialModel

        hp = default_hparams()
        hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H, n_actions=2,
                          use_conv_lstm=True, regress_actions=True,
                          one_step_planner="continuous",
                          action_activation="tanh"))
        m = SequentialModel(hp=dict(hp))
        inputs = make_inputs()
        p = jax.jit(lambda i: m.init({"params": KEY, "sample": KEY}, i,
                                     "train", "posterior"))(inputs)
        out = jax.jit(lambda p, i: m.apply(p, i, "train", "posterior",
                                           rngs={"sample": KEY}))(p, inputs)
        assert "dense_action_rec" in out.losses
        assert np.isfinite(float(out.losses.total.value))

    def test_act_cond_inference_tree(self):
        """act_cond_inference fuses zero-padded actions into the inference
        encoding (ActionConditioningWrapper, misc.py:59-70)."""
        from video_gcp_tpu.models.tree import TreeModel

        hp = default_hparams()
        hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H,
                          hierarchy_levels=3, matching_type="balanced",
                          seq_enc="conv", act_cond_inference=True,
                          n_actions=2))
        m = TreeModel(hp=dict(hp))
        inputs = make_inputs()
        p = jax.jit(lambda i: m.init({"params": KEY, "sample": KEY}, i,
                                     "train", "posterior"))(inputs)
        out = jax.jit(lambda p, i: m.apply(p, i, "train", "posterior",
                                           rngs={"sample": KEY}))(p, inputs)
        assert out.tree.images.shape == (B, 7, H, H, 3)
        assert np.isfinite(float(out.losses.total.value))
        # the action-fusion MLP must actually be in the param tree
        flat = jax.tree_util.tree_flatten_with_path(p)[0]
        assert any("act_cond_net" in "/".join(str(k) for k in path)
                   for path, _ in flat)

    @pytest.mark.parametrize("flag", ["pixel_shift_decoder",
                                      "add_weighted_pixel_copy"])
    def test_dead_decoder_flags_raise(self, flag):
        from video_gcp_tpu.models.tree import TreeModel

        hp = default_hparams()
        hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H,
                          hierarchy_levels=3, matching_type="balanced"))
        hp[flag] = True
        m = TreeModel(hp=dict(hp))
        with pytest.raises(NotImplementedError):
            m.init({"params": KEY, "sample": KEY}, make_inputs(), "train",
                   "posterior")

    def test_invalid_switch_values_raise(self):
        from video_gcp_tpu.models.tree import TreeModel

        hp = default_hparams()
        hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H,
                          hierarchy_levels=3, matching_type="balanced",
                          dense_rec_type="bogus"))
        with pytest.raises(ValueError):
            TreeModel(hp=dict(hp)).init(
                {"params": KEY, "sample": KEY}, make_inputs(), "train",
                "posterior")

    def test_tree_decoder_action_regression_guarded(self):
        from video_gcp_tpu.models.tree import TreeModel

        hp = default_hparams()
        hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H, n_actions=2,
                          hierarchy_levels=3, matching_type="balanced",
                          regress_actions=True,
                          one_step_planner="continuous"))
        with pytest.raises(NotImplementedError):
            TreeModel(hp=dict(hp)).init(
                {"params": KEY, "sample": KEY}, make_inputs(), "train",
                "posterior")

    def test_n_conv_layers_and_separate_start_goal_encoder(self):
        from video_gcp_tpu.models.tree import TreeModel

        hp = default_hparams()
        hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H,
                          hierarchy_levels=3, matching_type="balanced",
                          n_conv_layers=3,
                          separate_cnn_start_goal_encoder=True))
        m = TreeModel(hp=dict(hp))
        inputs = make_inputs()
        p = jax.jit(lambda i: m.init({"params": KEY, "sample": KEY}, i,
                                     "train", "posterior"))(inputs)
        out = jax.jit(lambda p, i: m.apply(p, i, "train", "posterior",
                                           rngs={"sample": KEY}))(p, inputs)
        assert out.tree.images.shape == (B, 7, H, H, 3)
        assert np.isfinite(float(out.losses.total.value))
        # a separate start/goal encoder must add parameters
        names = set(p["params"].keys())
        assert any("start_goal" in n or "ConvEncoder_1" in n for n in names), names


class TestAdaptiveShapeGuard:
    def test_too_few_nodes_for_soft_dtw_raises(self):
        """Adaptive matching needs 2^L-1 >= max_seq_len (no-horizontal
        soft-DTW); must fail at model build with an actionable message, not
        as a shape assert inside the loss."""
        from video_gcp_tpu.models.tree import TreeModel

        hp = default_hparams()
        hp.overwrite(dict(batch_size=B, max_seq_len=T, img_sz=H,
                          hierarchy_levels=2,  # 3 nodes < T frames
                          matching_type="dtw_latent"))
        with pytest.raises(ValueError, match="hierarchy_levels"):
            TreeModel(hp=dict(hp)).init(
                {"params": KEY, "sample": KEY}, make_inputs(), "train",
                "posterior")
