"""CEM planning stack tests: simulator contract, flat + hierarchical planners,
tree-latent optimizer semantics."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_gcp_tpu.core import AttrDict
from video_gcp_tpu.models.hyperparameters import default_hparams
from video_gcp_tpu.models.sequential import SequentialModel
from video_gcp_tpu.models.tree import TreeModel
from video_gcp_tpu.planning.cem.cem_planner import (
    CEMPlanner,
    HierarchicalImageCEMPlanner,
)
from video_gcp_tpu.planning.cem.cost_fcn import L2ImageCost
from video_gcp_tpu.planning.cem.sampler import (
    ImageHierarchicalTreeCEMSampler,
    SimpleTreeCEMSampler,
)
from video_gcp_tpu.planning.cem.simulator import GCPImageSimulator
from video_gcp_tpu.planning.tree_optimizer import HierarchicalTreeLatentOptimizer

L, IMG, T, NZ = 4, 16, 15, 8


@pytest.fixture(scope="module")
def sim():
    hp = default_hparams()
    hp.overwrite(dict(
        batch_size=1, max_seq_len=T, img_sz=IMG, hierarchy_levels=L,
        matching_type="balanced", seq_enc="conv", tree_lstm="sum",
        regress_length=True, attach_inv_mdl=True,
        inv_mdl_params=dict(n_actions=2), attach_state_regressor=True,
        state_dim=2, n_actions=2, nz_vae=NZ,
    ))
    model = TreeModel(hp=dict(hp))
    key = jax.random.PRNGKey(0)
    fake = AttrDict(
        I_0=jnp.zeros((2, IMG, IMG, 3)), I_g=jnp.zeros((2, IMG, IMG, 3)),
        end_ind=jnp.array([T - 1, T - 1]), start_ind=jnp.zeros((2,), jnp.int32),
        z=jnp.zeros((2, 2 ** L - 1, NZ)),
    )
    params = jax.jit(
        lambda i: model.init({"params": key, "sample": key}, i, "plan",
                             "prior", True)
    )(fake)
    return GCPImageSimulator(model, params, append_latent=True)


@pytest.fixture(scope="module")
def seq_sim():
    """VRNN (sequential) predictor as the CEM rollout engine —
    the gcp_sequential planning path (ref: planner_policy CEMPolicy over a
    sequential checkpoint, experiments/control/*/gcp_sequential)."""
    hp = default_hparams()
    hp.overwrite(dict(
        batch_size=1, max_seq_len=T, img_sz=IMG, hierarchy_levels=0,
        regress_length=True, attach_inv_mdl=True,
        inv_mdl_params=dict(n_actions=2), attach_state_regressor=True,
        state_dim=2, n_actions=2, nz_vae=NZ,
    ))
    model = SequentialModel(hp=dict(hp))
    key = jax.random.PRNGKey(0)
    fake = AttrDict(
        I_0=jnp.zeros((2, IMG, IMG, 3)), I_g=jnp.zeros((2, IMG, IMG, 3)),
        end_ind=jnp.array([T - 1, T - 1]), start_ind=jnp.zeros((2,), jnp.int32),
        z=jnp.zeros((2, T, NZ)),
    )
    params = jax.jit(
        lambda i: model.init({"params": key, "sample": key}, i, "plan",
                             "prior", True)
    )(fake)
    return GCPImageSimulator(model, params, append_latent=True)


class TestSimulator:
    def test_rollout_contract(self, sim):
        rng = np.random.RandomState(0)
        state = rng.rand(1, IMG, IMG, 3).astype(np.float32)
        goal = rng.rand(1, IMG, IMG, 3).astype(np.float32)
        z = rng.randn(4, 2 ** L - 1, NZ).astype(np.float32)
        out = sim.rollout(state, goal, z, T)
        assert len(out.predictions) == 4
        for p, lat, a, s in zip(out.predictions, out.latents, out.actions,
                                out.states):
            assert p.ndim == 2 and p.shape[1] == IMG * IMG * 3 + 32
            assert lat.shape[0] == p.shape[0]
            assert s.shape[1] == 2

    def test_injected_z_deterministic_predictions(self, sim):
        rng = np.random.RandomState(1)
        state = rng.rand(1, IMG, IMG, 3).astype(np.float32)
        goal = rng.rand(1, IMG, IMG, 3).astype(np.float32)
        z = rng.randn(2, 2 ** L - 1, NZ).astype(np.float32)
        # pin the internal rng: only the sampled sequence length depends on it
        # when z is injected
        sim._rng = jax.random.PRNGKey(42)
        o1 = sim.rollout(state, goal, z, T)
        sim._rng = jax.random.PRNGKey(42)
        o2 = sim.rollout(state, goal, z, T)
        np.testing.assert_allclose(o1.predictions[0], o2.predictions[0],
                                   atol=1e-5)


class TestShardedSimulator:
    def test_mesh_rollout_matches_single_device(self, sim):
        """SPMD candidate sharding (GCPSimulator mesh arg): candidates split
        over an 8-device mesh must score bitwise-equivalently to the
        single-device path, including when the candidate count does not
        divide the mesh (internal bucket rounds up)."""
        from video_gcp_tpu.parallel.mesh import make_mesh
        from video_gcp_tpu.planning.cem.simulator import GCPImageSimulator

        mesh = make_mesh(8)
        ssim = GCPImageSimulator(
            sim._model, jax.device_get(sim._params), append_latent=True,
            mesh=mesh)
        rng = np.random.RandomState(3)
        state = rng.rand(1, IMG, IMG, 3).astype(np.float32)
        goal = rng.rand(1, IMG, IMG, 3).astype(np.float32)
        z = rng.randn(5, 2 ** L - 1, NZ).astype(np.float32)  # 5 % 8 != 0
        sim._rng = jax.random.PRNGKey(7)
        ssim._rng = jax.random.PRNGKey(7)
        ref = sim.rollout(state, goal, z, T)
        out = ssim.rollout(state, goal, z, T)
        assert len(out.predictions) == 5
        assert ssim._pad_bucket % 8 == 0  # padded to a mesh multiple
        for a, b in zip(ref.predictions, out.predictions):
            np.testing.assert_allclose(a, b, atol=1e-4)


class TestPlanners:
    def test_flat_cem(self, sim):
        rng = np.random.RandomState(0)
        state = rng.rand(1, IMG, IMG, 3).astype(np.float32)
        goal = rng.rand(1, IMG, IMG, 3).astype(np.float32)
        L2ImageCost.LATENT_SIZE = 32
        planner = CEMPlanner(dict(
            action_dim=NZ, n_iters=2, batch_size=8, max_rollout_bs=8,
            elite_frac=0.25, cost_fcn=L2ImageCost, dense_cost=False,
            sampler=functools.partial(SimpleTreeCEMSampler,
                                      n_level_hierarchy=L),
            max_seq_len=T, horizon=T,
        ), sim)
        pred, actions, latents, score = planner(state, goal)
        assert np.asarray(pred).shape[1] == IMG * IMG * 3 + 32
        assert np.isfinite(float(score))

    def test_hierarchical_image_cem(self, sim):
        rng = np.random.RandomState(0)
        state = rng.rand(1, IMG, IMG, 3).astype(np.float32)
        goal = rng.rand(1, IMG, IMG, 3).astype(np.float32)

        def cost_model_fn(enc1, enc2):
            return np.linalg.norm(
                np.asarray(enc1) - np.asarray(enc2), axis=-1, keepdims=True
            )

        planner = HierarchicalImageCEMPlanner(dict(
            action_dim=NZ, n_iters=3, batch_size=8, max_rollout_bs=8,
            cost_config=dict(model_fn=cost_model_fn, input_dim=32),
            sampler=ImageHierarchicalTreeCEMSampler,
            n_level_hierarchy=L, sampling_rates_per_layer=[4, 4],
            n_ll_samples=3, max_seq_len=T,
        ), sim)
        pred, actions, latents, score = planner(state, goal)
        assert planner._sampler.fully_optimized
        assert np.isfinite(np.asarray(score)).all()


class TestSequentialPlanner:
    """End-to-end flat CEM over per-step VRNN latents (gcp_sequential path)."""

    def test_sequential_flat_cem(self, seq_sim):
        rng = np.random.RandomState(0)
        state = rng.rand(1, IMG, IMG, 3).astype(np.float32)
        goal = rng.rand(1, IMG, IMG, 3).astype(np.float32)
        L2ImageCost.LATENT_SIZE = 32
        planner = CEMPlanner(dict(
            action_dim=NZ, n_iters=2, batch_size=6, max_rollout_bs=6,
            elite_frac=0.5, cost_fcn=L2ImageCost, dense_cost=False,
            max_seq_len=T, horizon=T,
        ), seq_sim)
        pred, actions, latents, score = planner(state, goal)
        assert np.asarray(pred).shape[1] == IMG * IMG * 3 + 32
        assert actions is not None and np.asarray(actions).shape[-1] == 2
        assert np.isfinite(float(score))


class TestTreeOptimizerUnit:
    def test_sample_shape_and_collapse(self):
        class ZeroCost:
            input_dim = 4

            def __call__(self, a, b):
                return np.linalg.norm(a - b, axis=-1)

        opt = HierarchicalTreeLatentOptimizer(
            latent_dim=3, sampling_rates=[5], depth=3,
            subgoal_cost_fcn=ZeroCost(), ll_cost_fcn=ZeroCost(),
            final_layer_samples=4,
        )
        z = opt.sample()
        # 5 top-level samples, each with 1-sample children below -> 5 rows,
        # 7 latents each (depth-3 tree)
        assert z.shape == (5, 7, 3)
        # feed fake rollouts (joined state+latent, T=7, D=4+4)
        rollouts = [np.random.rand(7, 8) for _ in range(5)]
        goal = np.random.rand(8)
        opt.optimize(rollouts, goal)
        assert opt._frozen[3]  # root (df index 3 in a depth-3 tree) frozen
        z2 = opt.sample()
        # top layer collapsed to optimal z; final layer now optimizing with 4
        assert z2.shape == (4, 7, 3)
        np.testing.assert_allclose(z2[:, 3], np.tile(opt._opt_z[0], (4, 1)))


class TestCEMLoopUnits:
    """Unit tests for the pure CEM pieces (no model): run_cem, RolloutBatch,
    and the PDDM proposal distribution."""

    def test_run_cem_pure_loop(self):
        from video_gcp_tpu.planning.cem.cem_planner import (
            EliteSet, RolloutBatch, run_cem,
        )

        rng = np.random.RandomState(0)
        target = np.full((1, 3), 0.7)
        refits = []

        def sample_fn(n):
            return rng.randn(n, 1, 3)

        def evaluate_fn(z):
            return RolloutBatch(predictions=list(z), latents=list(z),
                                states=[], actions=[])

        def select_fn(rollouts, z):
            scores = np.array(
                [np.linalg.norm(p - target) for p in rollouts.predictions])
            order = np.argsort(scores)[:4]
            return EliteSet(images=[rollouts.predictions[i] for i in order],
                            states=[], scores=scores[order],
                            samples=np.asarray(z)[order])

        elite, history = run_cem(3, 16, sample_fn, evaluate_fn, select_fn,
                                 lambda s, c: refits.append(s))
        assert len(history) == 3 and len(refits) == 3
        assert elite is history[-1]
        # scores ascending within an EliteSet; elites beat the median draw
        assert np.all(np.diff(elite.scores) >= 0)

    def test_rollout_batch_take_and_clip(self):
        from video_gcp_tpu.planning.cem.cem_planner import RolloutBatch

        b = RolloutBatch()
        b.absorb(AttrDict(predictions=[np.zeros((5, 2)), np.ones((7, 2))],
                          latents=[np.zeros((5, 4)), np.ones((7, 4))],
                          states=[], actions=[]))
        b.absorb(AttrDict(predictions=[np.full((9, 2), 2.0)],
                          latents=[np.full((9, 4), 2.0)],
                          states=[], actions=[]))
        assert len(b) == 3
        picked = b.take([2, 0])
        assert picked.predictions[0][0, 0] == 2.0
        assert picked.states == []
        clipped = b.clipped(6)
        assert [p.shape[0] for p in clipped.predictions] == [5, 6, 6]

    def test_pddm_sampler_correlation_and_refit(self):
        from video_gcp_tpu.planning.cem.sampler import PDDMSampler

        np.random.seed(0)
        s = PDDMSampler(1e9, 40, 2, 0.3)
        z = s.sample(512)
        assert z.shape == (512, 40, 2)
        d = z - z.mean(0)
        lag1 = np.mean(d[:, 1:] * d[:, :-1]) / np.mean(d * d)
        assert lag1 > 0.3, f"AR(1) noise not time-correlated: {lag1:.3f}"
        # kernel matches the recursion n_t = B x_t + (1-B) n_{t-1} exactly
        white = np.random.randn(3, 40, 2)
        ref, n_i = [], np.zeros((3, 2))
        for t in range(40):
            n_i = s.BETA * white[:, t] + (1 - s.BETA) * n_i
            ref.append(n_i.copy())
        ref = np.stack(ref, 1)
        lag = np.arange(40)[:, None] - np.arange(40)
        kernel = np.tril(s.BETA * (1 - s.BETA) ** np.maximum(lag, 0))
        np.testing.assert_allclose(
            np.einsum("ts,nsd->ntd", kernel, white), ref, atol=1e-12)
        # softmax path-integral refit pulls the mean toward cheap samples
        costs = np.linalg.norm(z - 0.5, axis=(1, 2))
        s.fit(z, costs)
        before = np.linalg.norm(np.zeros((40, 2)) - 0.5)
        assert np.linalg.norm(s.get_dists().mean - 0.5) < before


class TestProgressAwareTracking:
    """localize_on_plan: the pure step behind ImageCEMPolicy's
    tracking_window>0 closed loop (BEYOND REFERENCE, control intervention C;
    planner_policy._infer_action_localized)."""

    def test_localizes_within_window_and_targets_next(self):
        from video_gcp_tpu.planning.planner_policy import localize_on_plan

        plan = jnp.asarray(np.linspace(0, 1, 11)[:, None] *
                           np.ones((1, 4), np.float32))
        # agent sits at plan position 3; window [0, 5] includes it
        enc = plan[3] + 1e-3
        tgt, near = localize_on_plan(enc, plan, jnp.asarray(0), 5)
        assert int(near) == 3 and int(tgt) == 4

    def test_window_excludes_positions_outside_floor_range(self):
        from video_gcp_tpu.planning.planner_policy import localize_on_plan

        plan = jnp.asarray(np.linspace(0, 1, 11)[:, None] *
                           np.ones((1, 4), np.float32))
        enc = plan[9]  # true nearest is 9, but the window caps at floor+3
        tgt, near = localize_on_plan(enc, plan, jnp.asarray(2), 3)
        assert int(near) == 5 and int(tgt) == 6  # clamps to window edge
        # cannot go backward past the floor either
        enc0 = plan[0]
        tgt, near = localize_on_plan(enc0, plan, jnp.asarray(4), 3)
        assert int(near) == 4 and int(tgt) == 5

    def test_target_clamps_at_plan_end(self):
        from video_gcp_tpu.planning.planner_policy import localize_on_plan

        plan = jnp.asarray(np.random.RandomState(0)
                           .randn(6, 3).astype(np.float32))
        tgt, near = localize_on_plan(plan[5], plan, jnp.asarray(3), 5)
        assert int(near) == 5 and int(tgt) == 5
