"""Planner policies: CEM planning with a trained GCP predictor.

Reference: gcp/planning/planner_policy.py:13-236. Loads the trained predictor
from an orbax checkpoint, replans every `replan_interval` steps up to
`num_max_replans`, and executes the plan via inferred (inverse-model) actions,
delta-state actions, or closed-loop re-inference of actions from the latent
plan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.params import ParamDict
from video_gcp_tpu.models.hyperparameters import default_hparams
from video_gcp_tpu.models.tree import TreeModel
from video_gcp_tpu.planning.cem.cem_planner import CEMPlanner, ImageCEMPlanner
from video_gcp_tpu.planning.cem.simulator import (
    ActCondGCPImageSimulator,
    GCPImageSimulator,
    GCPSimulator,
)
from video_gcp_tpu.planning.infra.policy.policy import Policy
from video_gcp_tpu.training import checkpoint as ckpt_lib


def localize_on_plan(enc, plan_flat, floor, window):
    """Pure localization step for progress-aware tracking: nearest plan index
    to `enc` within [floor, floor + window], and the waypoint index after it.

    :param enc: current frame encoding, any shape that flattens to [D]
    :param plan_flat: latent timeline [T, D]
    :param floor: monotone cursor floor (int scalar)
    :param window: static int window size
    :return: (target_idx, nearest_idx) int scalars
    """
    t = plan_flat.shape[0]
    d = jnp.linalg.norm(plan_flat - enc.reshape(1, -1), axis=-1)
    idx = jnp.arange(t)
    d = jnp.where((idx >= floor) & (idx <= floor + window), d, jnp.inf)
    near = jnp.argmin(d)
    return jnp.minimum(near + 1, t - 1), near


class PlannerPolicy(Policy):
    def __init__(self, ag_params, policyparams, gpu_id=None, ngpu=None,
                 conversion_fcns=None, n_rooms=None):
        super().__init__()
        self.override_defaults(policyparams)
        self.verbose = self._hp.verbose
        self.log_dir = ag_params.get("log_dir", "/tmp")
        self.max_seq_len = ag_params["T"]
        params = dict(self._hp.params)
        params["batch_size"] = 1
        params.setdefault("max_seq_len", ag_params["T"])

        # build predictor + restore weights
        model_cls = self._hp.model_cls or TreeModel
        hp = default_hparams()
        hp.overwrite(params)
        self.planner_hp = hp
        self.planner = model_cls(hp=dict(hp))
        # device-resident once: numpy params would re-upload the whole tree
        # on every jitted call (incl. _infer_action at each env step)
        self.params = jax.device_put(self._restore_params())

        self.current_exec_step = None
        self.image_plan = None
        self.action_plan = None
        self.latent_plan = None
        self.planner_outputs = []
        self.num_replans = 0

    def _restore_params(self):
        assert self._hp.checkpt_path is not None
        load_epoch = "latest" if self._hp.load_epoch is None else self._hp.load_epoch
        path = ckpt_lib.resolve_resume(load_epoch, self._hp.checkpt_path)
        if path is None:
            raise ValueError(f"No checkpoint found at {self._hp.checkpt_path}")
        return ckpt_lib.load_params(path)

    def _default_hparams(self):
        p = super()._default_hparams()
        p.update(dict(
            params={},
            model_cls=None,
            checkpt_path=None,
            load_epoch=None,
            logger=None,
            verbose=False,
            max_dump_rollouts=5,
            replan_interval=1,
            num_max_replans=10,
        ))
        return p

    def reset(self):
        super().reset()
        self.current_exec_step = None
        self.action_plan = None
        self.image_plan = None
        self.num_replans = 0
        self.planner_outputs = []

    def act(self, t=None, i_tr=None, images=None, goal_image=None):
        self.t = t
        self.i_tr = i_tr
        self.goal_image = goal_image
        output = AttrDict()
        if (
            self.image_plan is None
            or self.image_plan.shape[0] - 1 <= self.current_exec_step
            or (t % self._hp.replan_interval == 0
                and self.num_replans < self._hp.num_max_replans)
        ):
            self._plan(images[t], goal_image, t)
            self.num_replans += 1
        output.actions = self.get_action(images[t])
        self.current_exec_step += 1
        return output

    def get_action(self, current_image):
        assert self.action_plan is not None
        if np.size(self.action_plan) < 1:
            return 0.05 * np.random.rand(2)
        step = min(self.current_exec_step, len(self.action_plan) - 1)
        return self.action_plan[step]

    def _plan(self, image, goal_image, step):
        raise NotImplementedError


class CEMPolicy(PlannerPolicy):
    """State-based CEM planning; actions are delta-states
    (planner_policy.py:127-186)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        cem_params = dict(self._hp.cem_params)
        cem_params.setdefault("max_seq_len", self.planner_hp["max_seq_len"])
        mesh = None
        if self._hp.planning_mesh_devices:
            # SPMD candidate sharding (see GCPSimulator docstring): the
            # TPU-native replacement for the reference's --nworkers process
            # pool. Uses at most the requested device count.
            import jax as _jax

            from video_gcp_tpu.parallel.mesh import make_mesh

            n = min(int(self._hp.planning_mesh_devices), len(_jax.devices()))
            if n > 1:
                mesh = make_mesh(n)
        self._cem_simulator = self.simulator_type(
            self.planner, self.params, append_latent=True, mesh=mesh
        )
        planner_cls = self._hp.cem_planner or self.planner_type
        self._cem_planner = planner_cls(cem_params, self._cem_simulator)

    def _default_hparams(self):
        p = super()._default_hparams()
        p.update(dict(cem_planner=None, cem_params={},
                      # >1: shard CEM candidates over a device mesh of (up
                      # to) this many chips for each rollout (SPMD planning;
                      # TPU-native analogue of run.py --nworkers)
                      planning_mesh_devices=0))
        return p

    def act(self, t=None, i_tr=None, state=None, goal=None,
            regression_state=None, images=None, run_super=False):
        if run_super:
            return super().act(t, i_tr, state, goal)
        self._images = images[:, 0] if images is not None and images.ndim == 5 \
            else images
        self._states = state
        return super().act(t, i_tr, state, goal)

    def _plan(self, state, goal, step):
        input_goal = goal[-1] if np.ndim(goal) > 1 else goal
        self.image_plan, action_plan, self.latent_plan, self.plan_cost = \
            self._cem_planner(state[None] if np.ndim(state) == 1 else state,
                              input_goal[None] if np.ndim(input_goal) == 1
                              else input_goal)
        self.current_exec_step = 0
        self.image_plan = np.asarray(self.image_plan)
        self.action_plan = self.image_plan[1:] - self.image_plan[:-1]

    def log_outputs_stateful(self, logger=None, global_step=None, phase=None,
                             dump_dir=None, **kwargs):
        self._cem_planner.log_verbose(logger, global_step, phase, self.i_tr,
                                      dump_dir)

    @property
    def simulator_type(self):
        return GCPSimulator

    @property
    def planner_type(self):
        return CEMPlanner


class ImageCEMPolicy(CEMPolicy):
    """Image-based CEM planning; inverse-model action execution, optionally
    closed-loop (planner_policy.py:189-236)."""

    def _default_hparams(self):
        p = super()._default_hparams()
        p.update(dict(closed_loop_execution=False, act_cond=False,
                      # > 0 enables progress-aware plan tracking (BEYOND
                      # REFERENCE, control intervention C): instead of
                      # advancing the plan cursor once per env step — which
                      # lets the tracked waypoint run away when wall
                      # collisions stall the agent (round-4 failure analysis,
                      # PARITY.md: ~97% of commanded motion rejected while
                      # the cursor marches on) — localize the current frame
                      # encoding against the plan's latent timeline within
                      # [floor, floor + window] and track the waypoint AFTER
                      # the nearest one. The cursor floor is monotone, so the
                      # plan still executes forward.
                      tracking_window=0))
        return p

    def act(self, t=None, i_tr=None, state=None, images=None, goal_image=None):
        self._images = images[:, 0] if images is not None and images.ndim == 5 \
            else images
        self._states = state
        return super().act(t, i_tr, images, goal_image, run_super=True)

    def _plan(self, state, goal, step):
        self.image_plan, self.action_plan, self.latent_plan, self.plan_cost = \
            self._cem_planner(state[None] if np.ndim(state) == 3 else state,
                              goal)
        self.current_exec_step = 0
        self._cursor_floor = 0

    def get_action(self, current_image):
        if self._hp.closed_loop_execution:
            if self._hp.tracking_window > 0:
                return self._infer_action_localized(current_image)
            target = self.latent_plan[
                min(self.current_exec_step + 1, len(self.latent_plan) - 1)
            ]
            return self._infer_action(current_image, target)
        return super().get_action(current_image)

    def _infer_action(self, current_img, target_latent):
        """Closed-loop: re-infer the action from the current image encoding to
        the planned next latent (planner_policy.py:222-227). Jitted once and
        cached — this runs at every environment step."""
        img = np.asarray(current_img, np.float32)
        if img.max() > 1.0:
            img = img / 255.0
        img = img * 2.0 - 1.0
        if img.ndim == 3:
            img = img[None]

        from video_gcp_tpu.planning.infra.sim.benchmarks import heartbeat

        heartbeat()
        if not hasattr(self, "_infer_action_fn"):
            def run(params, img, target):
                enc = self.planner.apply(
                    params, img, method=lambda m, x: m.encoder(x)[0],
                )
                return self.planner.apply(
                    params, enc, target[None],
                    method=lambda m, a, b: m.inv_mdl(a, b),
                )

            self._infer_action_fn = jax.jit(run)

        return np.asarray(self._infer_action_fn(
            self.params, jnp.asarray(img), jnp.asarray(target_latent)))[0]

    def _infer_action_localized(self, current_img):
        """Progress-aware closed loop (tracking_window > 0, BEYOND REFERENCE;
        see _default_hparams): localize the current encoding against the
        plan's latent timeline within [floor, floor + window], track the
        waypoint after the nearest one, and advance the monotone cursor floor
        to the localized position. One jitted call per env step."""
        img = np.asarray(current_img, np.float32)
        if img.max() > 1.0:
            img = img / 255.0
        img = img * 2.0 - 1.0
        if img.ndim == 3:
            img = img[None]

        from video_gcp_tpu.planning.infra.sim.benchmarks import heartbeat

        heartbeat()
        if not hasattr(self, "_infer_localized_fn"):
            window = int(self._hp.tracking_window)

            def run(params, img, plan, floor):
                enc = self.planner.apply(
                    params, img, method=lambda m, x: m.encoder(x)[0],
                )
                flat = plan.reshape(plan.shape[0], -1)
                tgt, near = localize_on_plan(enc, flat, floor, window)
                action = self.planner.apply(
                    params, enc, flat[tgt][None],
                    method=lambda m, a, b: m.inv_mdl(a, b),
                )
                return action, near

            self._infer_localized_fn = jax.jit(run)

        action, near = self._infer_localized_fn(
            self.params, jnp.asarray(img), jnp.asarray(self.latent_plan),
            jnp.asarray(self._cursor_floor, jnp.int32))
        self._cursor_floor = max(self._cursor_floor, int(near))
        return np.asarray(action)[0]

    @property
    def simulator_type(self):
        return GCPImageSimulator if not self._hp.act_cond \
            else ActCondGCPImageSimulator

    @property
    def planner_type(self):
        return ImageCEMPlanner
