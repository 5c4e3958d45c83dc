"""CEM samplers: flat Gaussian, PDDM correlated noise, tree-latent samplers.

Reference: gcp/planning/cem/sampler.py:7-143. Host-side numpy — the sampling
distributions are tiny; all heavy evaluation happens in the batched device
rollouts they feed.
"""
from __future__ import annotations

import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.planning.tree_optimizer import (
    HierarchicalTreeLatentOptimizer,
    ImageHierarchicalTreeLatentOptimizer,
)


class CEMSampler:
    """Interface for samplers used in the CEM optimization loop."""

    def __init__(self, clip_val, n_steps, action_dim, initial_std):
        self._clip_val = clip_val
        self._n_steps = n_steps
        self._action_dim = action_dim
        self._initial_std = initial_std
        self.init()

    def init(self):
        raise NotImplementedError

    def sample(self, n_samples):
        raise NotImplementedError

    def fit(self, data, scores):
        raise NotImplementedError

    def get_dists(self):
        raise NotImplementedError

    @property
    def append_latent(self):
        return False


class FlatCEMSampler(CEMSampler):
    """Per-step independent Gaussians."""

    def init(self):
        self.mean = np.zeros((self._n_steps, self._action_dim))
        self.std = self._initial_std * np.ones((self._n_steps, self._action_dim))

    def sample(self, n_samples):
        raw = np.random.normal(
            loc=self.mean, scale=self.std,
            size=(n_samples, self._n_steps, self._action_dim),
        )
        return np.clip(raw, -self._clip_val, self._clip_val)

    def fit(self, data, scores):
        self.mean = np.mean(data, axis=0)
        self.std = np.std(data, axis=0)

    def get_dists(self):
        return AttrDict(mean=self.mean, std=self.std)


class PDDMSampler(FlatCEMSampler):
    """Correlated noise + path-integral refit (sampler.py:52-71)."""

    BETA = 0.5  # noise correlation factor
    GAMMA = 1.0  # reward weighting factor

    def sample(self, n_samples):
        noise = np.random.normal(
            loc=np.zeros_like(self.mean), scale=self.std,
            size=(n_samples, self._n_steps, self._action_dim),
        )
        correlated, n_i = [], np.zeros((n_samples, self._action_dim))
        for i in range(noise.shape[1]):
            n_i = self.BETA * noise[:, i] + (1 - self.BETA) * n_i
            correlated.append(n_i)
        correlated = np.stack(correlated, axis=1)
        return np.clip(correlated + self.mean[None], -self._clip_val,
                       self._clip_val)

    def fit(self, actions, scores):
        """Lower scores are better (cost)."""
        w = np.exp(-self.GAMMA * scores)
        self.mean = np.sum(actions * w[:, None, None], axis=0) / np.sum(w)


class SimpleTreeCEMSampler(FlatCEMSampler):
    """Flat sampling over all 2^L - 1 tree latents at once."""

    def __init__(self, *args, n_level_hierarchy, **kwargs):
        self._n_layer_hierarchy = n_level_hierarchy
        args = list(args)
        args[1] = 2 ** n_level_hierarchy - 1  # n_steps = node count
        super().__init__(*args)

    @property
    def append_latent(self):
        return False


class HierarchicalTreeCEMSampler(SimpleTreeCEMSampler):
    """Layer-sequential tree-latent optimization (sampler.py:83-143):
    delegates sampling and eliting to the recursive tree optimizer."""

    def __init__(self, *args, sampling_rates_per_layer, subgoal_cost_fcn,
                 ll_cost_fcn, n_ll_samples, **kwargs):
        self._sampling_rates_per_layer = sampling_rates_per_layer
        self._subgoal_cost_fcn = subgoal_cost_fcn
        self._ll_cost_fcn = ll_cost_fcn
        self._n_ll_samples = n_ll_samples
        super().__init__(*args, **kwargs)
        assert self._n_layer_hierarchy >= len(sampling_rates_per_layer)

    def init(self):
        self._optimizer = HierarchicalTreeLatentOptimizer(
            self._action_dim,
            list(self._sampling_rates_per_layer),
            self._n_layer_hierarchy,
            self._subgoal_cost_fcn,
            self._ll_cost_fcn,
            self._n_ll_samples,
        )

    def sample(self, n_samples):
        raw = self._optimizer.sample()
        return np.clip(raw, -self._clip_val, self._clip_val)

    def optimize(self, rollouts, goal):
        best_rollout, best_cost = self._optimizer.optimize(rollouts, goal)
        if (best_rollout[-1] != goal).any():
            # too few frames on the right tree side: append the goal
            best_rollout = np.concatenate((best_rollout, goal[None]))
        return [best_rollout], best_cost

    def fit(self, *args, **kwargs):
        pass  # layer eliting happens inside optimize()

    def get_dists(self):
        return AttrDict(mean=0.0, std=1.0)

    @property
    def append_latent(self):
        return True  # latent rollouts needed for subgoal costs

    @property
    def fully_optimized(self):
        return self._optimizer.fully_optimized


class ImageHierarchicalTreeCEMSampler(HierarchicalTreeCEMSampler):
    """Image-prediction variant (reshapes flat pixels, sampler.py:129-143)."""

    def init(self):
        self._optimizer = ImageHierarchicalTreeLatentOptimizer(
            self._action_dim,
            list(self._sampling_rates_per_layer),
            self._n_layer_hierarchy,
            self._subgoal_cost_fcn,
            self._ll_cost_fcn,
            self._n_ll_samples,
        )

    def optimize(self, rollouts, goal):
        best_rollout, best_cost = self._optimizer.optimize(rollouts, goal)
        goal_img = np.asarray(goal[0]) * 2.0 - 1.0  # [H, W, C] in planner range
        if best_rollout[-1].shape != goal_img.shape or (
            best_rollout[-1] != goal_img
        ).any():
            best_rollout = np.concatenate((best_rollout, goal_img[None]))
        if not hasattr(best_cost, "__len__"):
            best_cost = [best_cost]
        return [best_rollout], best_cost
