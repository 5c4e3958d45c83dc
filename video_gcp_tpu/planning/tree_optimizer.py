"""Hierarchical tree-latent optimizer: layer-sequential CEM over GCP-tree
latents.

Reference: gcp/planning/tree_optimizer.py:7-260. Per optimization pass, the
currently-active layer samples N subgoal latents (one per candidate), every
layer above uses its already-optimized latent, and layers below collapse to a
single sample; the candidate subgoal is scored by the learned pairwise cost to
both parents (to-cost + from-cost), the argmin is frozen, and optimization
recurses into the left/right segments. The final layers are optimized as
best-of-N dense segments under the low-level cost. Host-side recursion (the
tree is small); all candidate scoring consumes the batched device rollouts.

Conventions: rollouts are [T_i, D] numpy arrays = flattened observations with
the model latent appended on the last `subgoal_cost_fcn.input_dim` dims;
images are NHWC.
"""
from __future__ import annotations

import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict, listdict2dictlist


class HierarchicalTreeLatentOptimizer:
    def __init__(self, latent_dim, sampling_rates, depth, subgoal_cost_fcn,
                 ll_cost_fcn, final_layer_samples):
        self._latent_dim = latent_dim
        self._depth = depth
        self._subgoal_cost_fcn = subgoal_cost_fcn
        self._ll_cost_fcn = ll_cost_fcn
        self._is_optimized = False
        self._opt_z = None
        self._latest_z_samples = None
        if sampling_rates:
            self._n_samples = sampling_rates.pop(0)
            self._n_latents = 1
            self._children = [
                [
                    type(self)(latent_dim, sampling_rates.copy(), depth - 1,
                               subgoal_cost_fcn, ll_cost_fcn,
                               final_layer_samples)
                    for _ in range(self._n_samples)
                ]
                for _ in range(2)
            ]
        else:
            self._n_samples = final_layer_samples
            self._n_latents = 2 ** depth - 1
            self._children = None

        self.mean = np.zeros((self._n_latents, self._latent_dim))
        self.std = np.ones((self._n_latents, self._latent_dim))

    # ------------------------------------------------------------------

    def sample(self, below_opt_layer: bool = False) -> np.ndarray:
        """Concatenated df-order latent samples for the whole subtree."""
        if self._is_optimized:
            z = self._opt_z.copy()[None]
        else:
            z = self._sample()[:1] if below_opt_layer else self._sample()
            self._latest_z_samples = z.copy()
        next_below = (not self._is_optimized and not below_opt_layer) or below_opt_layer
        if self._children is not None:
            samples = []
            for child_left, child_right, z_i in zip(
                self._children[0], self._children[1], z
            ):
                z_left = child_left.sample(next_below)
                z_right = child_right.sample(next_below)
                assert z_left.shape == z_right.shape
                samples.append(
                    np.concatenate(
                        [z_left, np.tile(z_i[0], (z_left.shape[0], 1, 1)),
                         z_right],
                        axis=1,
                    )
                )
            z = np.concatenate(samples)
        return z

    def _sample(self):
        return np.random.normal(
            loc=self.mean, scale=self.std,
            size=(self._n_samples, self._n_latents, self._latent_dim),
        )

    # ------------------------------------------------------------------

    def optimize(self, all_rollouts, goal):
        if self._children is None:
            return self._optimize_segment(all_rollouts, goal)
        if not self._is_optimized:
            return self._optimize_subgoal(all_rollouts, goal)
        return self._recurse_optimization(all_rollouts, goal)

    def _optimize_segment(self, all_rollouts, goal):
        best_rollout, best_cost, best_idx = self._best_of_n_segments(
            all_rollouts, goal, self._ll_cost_fcn
        )
        self._opt_z = self._latest_z_samples[best_idx]
        self._is_optimized = True
        return best_rollout, best_cost

    def _optimize_subgoal(self, all_rollouts, goal):
        rollouts = self._split_state_rollout(all_rollouts)

        starts = np.stack([r[0] for r in rollouts.state_rollout])
        start_latents = np.stack([r[0] for r in rollouts.latent_rollout])
        sg_idx = [int(np.floor(r.shape[0] / 2)) for r in rollouts.state_rollout]
        subgoals = np.stack(
            [r[i] for r, i in zip(rollouts.state_rollout, sg_idx)]
        )
        subgoal_latents = np.stack(
            [r[i] for r, i in zip(rollouts.latent_rollout, sg_idx)]
        )
        # joined = goal carries the appended latent (same trailing dim as
        # rollout rows); raw goals (env states/images) lack it
        goal_is_joined = goal.shape[-1] == all_rollouts[0].shape[-1]
        if goal_is_joined:
            goal_split = self._split_state_rollout([goal[None]])
            goals = np.stack(
                [goal_split.state_rollout[0][0] for _ in rollouts.state_rollout]
            )
            goal_latents = np.stack(
                [goal_split.latent_rollout[0][0] for _ in rollouts.latent_rollout]
            )
        else:
            goals = np.stack([goal for _ in rollouts.state_rollout])
            goal_latents = np.stack([r[-1] for r in rollouts.latent_rollout])

        to_cost = self._subgoal_cost_fcn(start_latents, subgoal_latents)
        from_cost = self._subgoal_cost_fcn(subgoal_latents, goal_latents)
        total_cost = to_cost + from_cost

        opt_idx = int(np.argmin(total_cost))
        self._opt_z = self._latest_z_samples[opt_idx]

        outputs = [starts[opt_idx]]
        if (subgoals[opt_idx] != outputs[-1]).any():
            outputs.append(subgoals[opt_idx])
        if not goal_is_joined:
            g = goals[opt_idx]
            outputs.append(self._goal_to_state(g, outputs[-1]))
        output_rollout = np.stack(outputs)
        output_cost = total_cost[opt_idx]

        self._children = [c[:1] for c in self._children]
        self._n_samples = 1
        self._is_optimized = True
        return output_rollout, output_cost

    def _recurse_optimization(self, all_rollouts, goal):
        per_latent = np.array_split(np.asarray(all_rollouts, dtype=object),
                                    self._n_samples)
        best_costs, best_rollouts = [], []
        for child_left, child_right, rollouts in zip(
            self._children[0], self._children[1], per_latent
        ):
            rollouts = [r for r in rollouts]
            short_rollouts = []
            for r_idx, r in enumerate(rollouts):
                if r.shape[0] < 3:
                    # too short for further splitting: dummy with inf cost
                    short_rollouts.append(r)
                    rollouts[r_idx] = self._make_dummy_seq(r[0])

            sg_inds = [int(np.floor(r.shape[0] / 2)) for r in rollouts]
            subgoal = rollouts[0][sg_inds[0]]
            rollout_left, cost_left = child_left.optimize(
                [r[:si] for r, si in zip(rollouts, sg_inds)], subgoal
            )
            rollout_right, cost_right = child_right.optimize(
                [r[si:] for r, si in zip(rollouts, sg_inds)], goal
            )
            best_rollout = np.concatenate([rollout_left, rollout_right])
            best_cost = cost_left + cost_right

            if short_rollouts:
                r_short, c_short, _ = self._best_of_n_segments(
                    short_rollouts, goal, self._ll_cost_fcn
                )
                if c_short < best_cost or np.isnan(best_cost):
                    best_rollout, best_cost = r_short, c_short

            best_rollouts.append(best_rollout)
            best_costs.append(best_cost)

        idx = int(np.argmin(np.array(best_costs)))
        return best_rollouts[idx], best_costs[idx]

    # ------------------------------------------------------------------

    def _best_of_n_segments(self, all_rollouts, goal, cost_fcn):
        rollouts_opt, goal_opt = self._prep_segment_opt_inputs(all_rollouts, goal)
        cost = cost_fcn(rollouts_opt, goal_opt)
        idx = int(np.argmin(cost))
        return (
            self._split_state_rollout(all_rollouts).state_rollout[idx],
            cost[idx],
            idx,
        )

    def _prep_segment_opt_inputs(self, all_rollouts, goal):
        rollouts = self._split_state_rollout(all_rollouts).state_rollout
        if goal.shape[-1] == all_rollouts[0].shape[-1]:
            state_goal = self._split_state_rollout([goal]).state_rollout[0]
        else:
            state_goal = goal
        return rollouts, state_goal

    def _split_state_rollout(self, rollouts):
        d = self._subgoal_cost_fcn.input_dim
        return listdict2dictlist(
            [
                AttrDict(state_rollout=r[..., :-d], latent_rollout=r[..., -d:])
                for r in rollouts
            ]
        )

    def _goal_to_state(self, goal, reference):
        """Convert a raw goal into the rollout's state format."""
        if goal.shape == reference.shape:
            return goal
        return np.broadcast_to(goal, reference.shape).copy()

    @staticmethod
    def _make_dummy_seq(reference_array):
        return np.stack(
            [
                np.ones_like(reference_array) * float("inf"),
                np.zeros_like(reference_array),
                np.ones_like(reference_array) * float("inf"),
            ]
        )

    @property
    def fully_optimized(self):
        if self._children is not None:
            return self._is_optimized and all(
                c.fully_optimized for c in self._children[0]
            ) and all(c.fully_optimized for c in self._children[1])
        return self._is_optimized


class ImageHierarchicalTreeLatentOptimizer(HierarchicalTreeLatentOptimizer):
    """Image rollouts: the state part of the flattened rollout reshapes to
    NHWC images (reference tree_optimizer.py:226-260, channel-first there)."""

    def _split_state_rollout(self, rollouts):
        d = self._subgoal_cost_fcn.input_dim

        def reshape_to_image(flat):
            assert flat.ndim == 2
            res = int(np.sqrt(flat.shape[1] / 3))
            return flat.reshape(flat.shape[0], res, res, 3)

        return listdict2dictlist(
            [
                AttrDict(
                    state_rollout=reshape_to_image(r[..., :-d]),
                    latent_rollout=r[..., -d:],
                )
                for r in rollouts
            ]
        )

    def _prep_segment_opt_inputs(self, all_rollouts, goal):
        rollouts = self._split_state_rollout(all_rollouts).latent_rollout
        if np.ndim(goal) > 2:  # raw image goal: use final rollout latent
            state_goal = [r[-1:] for r in rollouts]
        else:
            state_goal = [
                self._split_state_rollout([goal[None]]).latent_rollout[0]
                for _ in rollouts
            ]
        return rollouts, state_goal

    def _goal_to_state(self, goal, reference):
        if goal.ndim == 4:  # [1, H, W, C] env image in [0, 1]
            return goal[0] * 2.0 - 1.0
        return super()._goal_to_state(goal, reference)
