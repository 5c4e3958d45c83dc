"""CEM planners: generic, hierarchical (tree), image variants.

Reference: gcp/planning/cem/cem_planner.py:15-266. Orchestration is host-side
(tiny state); every candidate evaluation is a batched device rollout through
GCPSimulator. The max_rollout_bs splitting is kept for memory parity.
"""
from __future__ import annotations

import copy
import os
import pickle
from collections import defaultdict

import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.params import ParamDict
from video_gcp_tpu.planning.cem.cost_fcn import (
    EuclideanPathLength,
    LearnedCostEstimate,
)
from video_gcp_tpu.planning.cem.sampler import (
    FlatCEMSampler,
    HierarchicalTreeCEMSampler,
)


class CEMPlanner:
    """Generic CEM planner."""

    def __init__(self, hp, simulator):
        self._hp = self._default_hparams().overwrite(hp)
        self._simulator = simulator
        self._cost_fcn = self._build_cost()
        self._sampler = self._build_sampler()
        self._logs = []

    def _default_hparams(self) -> ParamDict:
        p = ParamDict(
            horizon=None,
            action_dim=None,
            n_iters=1,
            batch_size=64,
            max_rollout_bs=100,
            elite_frac=0.1,
        )
        p.update(ParamDict(
            cost_fcn=EuclideanPathLength,
            dense_cost=False,
            final_step_cost_weight=1.0,
        ))
        p.update(ParamDict(
            sampler=FlatCEMSampler,
            sampler_clip_val=float("inf"),
            initial_std=3e-1,
        ))
        p.update(ParamDict(
            verbose=False,
            dump_planning_data=False,
            use_delta_state_actions=False,
            use_inferred_actions=True,
            max_seq_len=None,
        ))
        return p

    # ------------------------------------------------------------------

    def __call__(self, state, goal_state):
        logs = []
        self._sampler.init()
        best_samples, best_scores = None, None
        for _ in range(self._hp.n_iters):
            samples = self._sampler.sample(self._hp.batch_size)
            rollouts = self._rollout(state, goal_state, samples)
            (best_rollouts, best_rollouts_states, best_scores, best_samples,
             elite_idxs) = self._get_best_rollouts(rollouts, goal_state, samples)
            self._sampler.fit(best_samples, best_scores)
            logs.append(AttrDict(
                elite_rollouts=copy.deepcopy(best_rollouts),
                elite_scores=best_scores,
                dists=self._sampler.get_dists(),
                goal_state=goal_state,
                elite_states=copy.deepcopy(best_rollouts_states),
            ))

        final_rollouts = self._rollout(state, goal_state, best_samples)
        logs.append(AttrDict(
            elite_rollouts=copy.deepcopy(
                self._maybe_split_image(final_rollouts.predictions)
            ),
            elite_scores=best_scores,
            dists=self._sampler.get_dists(),
            goal_state=goal_state,
            elite_states=copy.deepcopy(final_rollouts.states),
        ))
        best_actions = self._get_action_plan(final_rollouts, best_samples)
        self._logs.append(logs)
        return (
            final_rollouts.predictions[0],
            best_actions[0] if len(best_actions) else None,
            final_rollouts.latents[0],
            best_scores[0],
        )

    # ------------------------------------------------------------------

    def _build_cost(self):
        return self._hp.cost_fcn(self._hp.dense_cost,
                                 self._hp.final_step_cost_weight)

    def _build_sampler(self):
        return self._hp.sampler(
            self._hp.sampler_clip_val, self._hp.max_seq_len,
            self._hp.action_dim, self._hp.initial_std,
        )

    def _rollout(self, state, goal, samples):
        output = defaultdict(list)
        # ceil: the reference floor-divides (cem_planner.py:115-122), silently
        # dropping the tail when batch_size % max_rollout_bs != 0
        n_chunks = max(-(-samples.shape[0] // self._hp.max_rollout_bs), 1)
        for i in range(n_chunks):
            chunk = samples[
                i * self._hp.max_rollout_bs : (i + 1) * self._hp.max_rollout_bs
            ]
            sim_output = self._simulator.rollout(
                state, goal, chunk, self._hp.max_seq_len
            )
            for key in sim_output:
                output[key] = output[key] + sim_output[key]
        return AttrDict(
            {key: self._cap_to_horizon(output[key]) for key in output}
        )

    def _get_best_rollouts(self, rollouts, goal_state, samples):
        scores = self._cost_fcn(rollouts.predictions, goal_state)
        full_elite_idxs = scores.argsort()
        elite_idxs = full_elite_idxs[
            : int(self._hp.batch_size * self._hp.elite_frac)
        ]
        best_rollouts = [rollouts.predictions[i] for i in elite_idxs]
        best_states = [rollouts.states[i] for i in elite_idxs] \
            if rollouts.states else []
        return (
            self._maybe_split_image(best_rollouts),
            best_states,
            scores[elite_idxs],
            samples[elite_idxs],
            elite_idxs,
        )

    def _maybe_split_image(self, rollout):
        if hasattr(self._cost_fcn, "_split_state_rollout"):
            return self._cost_fcn._split_state_rollout(rollout).image_rollout
        return rollout

    def _get_action_plan(self, final_rollouts, best_samples):
        if self._hp.use_delta_state_actions:
            return [b[1:] - b[:-1] for b in final_rollouts.states]
        if self._hp.use_inferred_actions:
            return final_rollouts.actions
        return best_samples

    def _cap_to_horizon(self, vals):
        if self._hp.horizon is not None:
            return [v[: self._hp.horizon] for v in vals]
        return vals

    @property
    def append_latent(self):
        return self._sampler.append_latent

    # ------------------------------------------------------------------

    def log_verbose(self, logger, step, phase, i_tr, dump_dir):
        if self._hp.dump_planning_data:
            os.makedirs(os.path.join(dump_dir, "planning"), exist_ok=True)
            with open(
                os.path.join(dump_dir, f"planning/traj{i_tr}_raw_data.pkl"),
                "wb",
            ) as f:
                pickle.dump(self._logs, f)
        self._logs = []

    def hack_add_state(self, state):
        self._logs[-1][-1].state = state.copy()


class HierarchicalCEMPlanner(CEMPlanner):
    """CEM planner with layer-sequential tree optimization."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self._hp.sampling_rates_per_layer is not None:
            assert self._hp.n_iters == len(self._hp.sampling_rates_per_layer) + 1

    def _default_hparams(self):
        p = super()._default_hparams()
        p.update(ParamDict(
            horizon=None,
            cost_fcn=LearnedCostEstimate,
            cost_config={},
            LL_cost_fcn=None,
            sampler=HierarchicalTreeCEMSampler,
            n_level_hierarchy=None,
            sampling_rates_per_layer=None,
            n_ll_samples=5,
        ))
        return p

    def _build_cost(self):
        cost_fcn = self._hp.cost_fcn(self._hp.cost_config)
        self._ll_cost_fcn = (
            cost_fcn if self._hp.LL_cost_fcn is None
            else self._hp.LL_cost_fcn(self._hp.dense_cost,
                                      self._hp.final_step_cost_weight)
        )
        return cost_fcn

    def _build_sampler(self):
        return self._hp.sampler(
            self._hp.sampler_clip_val, self._hp.max_seq_len,
            self._hp.action_dim, self._hp.initial_std,
            n_level_hierarchy=self._hp.n_level_hierarchy,
            sampling_rates_per_layer=self._hp.sampling_rates_per_layer,
            subgoal_cost_fcn=self._cost_fcn,
            ll_cost_fcn=self._ll_cost_fcn,
            n_ll_samples=self._hp.n_ll_samples,
        )

    def _get_best_rollouts(self, rollouts, goal_state, samples):
        if not isinstance(self._sampler, HierarchicalTreeCEMSampler):
            return super()._get_best_rollouts(rollouts, goal_state, samples)
        best_rollouts, best_scores = self._sampler.optimize(
            rollouts.predictions, goal_state
        )
        best_samples = self._sampler.sample(self._hp.batch_size)
        elite_idxs = np.arange(len(best_rollouts))
        return best_rollouts, rollouts.states, np.asarray(best_scores), \
            best_samples, elite_idxs


class ImageCEMPlanner(CEMPlanner):
    """Adds verbose TB image logging of elite plans (cem_planner.py:222-255)."""

    def log_verbose(self, logger, step, phase, i_tr, dump_dir):
        if self._hp.verbose and logger is not None:
            for replan_idx, replan_log in enumerate(self._logs):
                for it_idx, iter_log in enumerate(replan_log):
                    plans = []
                    for plan in iter_log.elite_rollouts:
                        plan = np.clip((np.asarray(plan) + 1) / 2, 0, 1)
                        t = plan.shape[0]
                        if self._hp.horizon and t < self._hp.horizon:
                            pad = np.ones((self._hp.horizon - t,) + plan.shape[1:])
                            plan = np.concatenate([plan, pad])
                        plans.append(np.concatenate(list(plan), axis=1))
                    strip = np.concatenate(plans, axis=0) * 2 - 1
                    logger.log_images(
                        strip[None],
                        f"elite_trajs_{i_tr}_test/plan_r{replan_idx}_iter{it_idx}",
                        step, phase,
                    )
        super().log_verbose(logger, step, phase, i_tr, dump_dir)


class HierarchicalImageCEMPlanner(HierarchicalCEMPlanner, ImageCEMPlanner):
    def log_verbose(self, *args, **kwargs):
        ImageCEMPlanner.log_verbose(self, *args, **kwargs)
