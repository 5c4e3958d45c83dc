"""CEM cost functions (reference: gcp/planning/cem/cost_fcn.py:9-117).

CostFcns score CEM rollouts: dense (summed per-step) or final-step cost, with
a final-step weight. Rollouts arrive as lists of [T_i, D] numpy arrays from
the planner (variable plan lengths are a host-side concern; the batched model
evaluations behind LearnedCostEstimate run on device).
"""
from __future__ import annotations

import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.attrdict import listdict2dictlist


class CostFcn:
    """Base class to define CEM cost functions."""

    def __init__(self, dense_cost, final_step_weight=1.0, *unused_args):
        self._dense_cost = dense_cost
        self._final_step_weight = final_step_weight

    def __call__(self, cem_outputs, goal):
        cost_per_step = self._compute(cem_outputs, goal)
        for i in range(len(cost_per_step)):
            cost_per_step[i][-1] *= self._final_step_weight
        if self._dense_cost:
            return np.array([np.sum(c) for c in cost_per_step])
        return np.array([c[-1] for c in cost_per_step])

    def _compute(self, cem_outputs, goal):
        raise NotImplementedError


class ImageCost:
    """Splits flattened image+latent rollouts (NHWC images). Costs that mix
    this in declare that their rollouts carry `input_dim` latent channels
    after the pixels; the planner asks for the image slice through
    image_rollouts() (explicit interface — reference probes hasattr on the
    private splitter, cem_planner.py:169-171)."""

    def image_rollouts(self, rollouts):
        """Image part of each flattened rollout, as [T, H, W, C] arrays."""
        return self._split_state_rollout(rollouts).image_rollout

    def _split_state_rollout(self, rollouts):
        def reshape_to_image(flat):
            assert flat.ndim == 2
            res = int(np.sqrt(flat.shape[1] / 3))
            return flat.reshape(flat.shape[0], res, res, 3)

        return listdict2dictlist(
            [
                AttrDict(
                    image_rollout=reshape_to_image(r[..., : -self.input_dim]),
                    latent_rollout=r[..., -self.input_dim:],
                )
                for r in rollouts
            ]
        )


class EuclideanDistance(CostFcn):
    """Euclidean distance between vals and goal."""

    def _compute(self, cem_outputs, goal):
        return [
            np.linalg.norm(out - goal[None], axis=-1) for out in cem_outputs
        ]


class EuclideanPathLength(CostFcn):
    """Euclidean length of the whole path to the goal."""

    def _compute(self, cem_outputs, goal):
        assert self._dense_cost, "path length needs dense cost"
        return [
            np.linalg.norm(
                np.concatenate([out[1:], goal[None]]) - out, axis=-1
            )
            for out in cem_outputs
        ]

    @staticmethod
    def gt_path_cost(seq, goal):
        """GT cost used by the cost-model trainer: cumulative path length."""
        path = np.concatenate([seq, goal[None]], 0)
        return float(np.linalg.norm(np.diff(path, axis=0), axis=-1).sum())

    def __init__(self, dense_cost=True, final_step_weight=1.0, *unused):
        super().__init__(dense_cost, final_step_weight)


class StepPathLength(CostFcn):
    """Cost equals the number of steps in the path."""

    def _compute(self, cem_outputs, goal):
        return [
            np.concatenate(
                [np.zeros(out.shape[0] - 1), np.array([float(out.shape[0])])]
            )
            for out in cem_outputs
        ]


class L2ImageCost(CostFcn, ImageCost):
    """L2 distance in image space."""

    LATENT_SIZE = 128

    def _compute(self, cem_outputs, goal_raw):
        image_sequences = self._split_state_rollout(cem_outputs).image_rollout
        goal = goal_raw * 2.0 - 1.0  # [1, H, W, C] raw in [0, 1]
        return [
            np.sqrt(np.sum((seq - goal) ** 2, axis=(1, 2, 3)))
            for seq in image_sequences
        ]

    @property
    def input_dim(self):
        return self.LATENT_SIZE


def make_test_time_cost_fn(checkpt_path, load_epoch="latest",
                           cost_params=None):
    """Restore the cost-model submodule from a predictor checkpoint and return
    a jitted callable(enc1, enc2) -> cost (TestTimeCostModel,
    cost_mdl.py:123-145: loads only the `cost_mdl` scope)."""
    import jax
    import jax.numpy as jnp

    from video_gcp_tpu.models.aux_models import CostModel
    from video_gcp_tpu.training import checkpoint as ckpt_lib

    path = ckpt_lib.resolve_resume(load_epoch, checkpt_path)
    if path is None:
        raise ValueError(f"no checkpoint under {checkpt_path}")
    params = ckpt_lib.load_params(path)
    sub = jax.device_put(ckpt_lib.extract_subtree(params, "cost_mdl"))
    p = dict(nz_mid=128, n_processing_layers=3)
    if cost_params:
        p.update(cost_params)
    model = CostModel(p)

    @jax.jit
    def run(enc1, enc2):
        return model.apply({"params": sub}, enc1, enc2)

    return lambda e1, e2: np.asarray(
        run(jnp.asarray(np.asarray(e1), jnp.float32),
            jnp.asarray(np.asarray(e2), jnp.float32))
    )


class LearnedCostEstimate:
    """Learned cost network between latent states (TestTimeCostModel wrap).

    :param config: dict with either `model_fn(enc1, enc2) -> cost` (a callable
        closing over restored cost-model params) or `checkpt_path` pointing at
        a predictor checkpoint whose `cost_mdl` scope is restored
        (cost_fcn.py:87-95 / cost_mdl.py TestTimeCostModel).
    """

    def __init__(self, config):
        if "model_fn" in config:
            self.net = config["model_fn"]
        else:
            self.net = make_test_time_cost_fn(
                config["checkpt_path"], config.get("load_epoch", "latest"),
                config.get("cost_params", None),
            )
        self._input_dim = config.get("input_dim", 128)

    def __call__(self, start_enc, goal_enc):
        if isinstance(start_enc, np.ndarray):
            return self._net_bucketed(start_enc, goal_enc)[..., 0]
        if isinstance(start_enc, list):
            # One fused, shape-bucketed net call for ALL sequences' step
            # pairs. The hierarchical optimizer scores segments of every
            # length; per-sequence calls would retrace/redispatch the jitted
            # cost net once per distinct length (minutes of compile churn on
            # the planning critical path).
            pairs_a, pairs_b, sizes = [], [], []
            for seq, goal in zip(start_enc, goal_enc):
                seq_input = np.concatenate([seq, goal], 0)
                pairs_a.append(seq_input[:-1])
                pairs_b.append(seq_input[1:])
                sizes.append(seq_input.shape[0] - 1)
            per_step = self._net_bucketed(
                np.concatenate(pairs_a), np.concatenate(pairs_b))[..., 0]
            bounds = np.cumsum([0] + sizes)
            return np.array([per_step[a:b].sum()
                             for a, b in zip(bounds[:-1], bounds[1:])])
        raise ValueError("unsupported input type for learned cost")

    def _net_bucketed(self, a, b):
        """Evaluate the cost net with the leading dim padded to a power-of-2
        bucket: O(log n) distinct compiled shapes over a whole benchmark."""
        a = np.asarray(a)
        b = np.asarray(b)
        n = a.shape[0]
        bucket = max(16, 1 << (n - 1).bit_length())
        if bucket > n:
            a = np.concatenate(
                [a, np.zeros((bucket - n,) + a.shape[1:], a.dtype)])
            b = np.concatenate(
                [b, np.zeros((bucket - n,) + b.shape[1:], b.dtype)])
        return np.asarray(self.net(a, b))[:n]

    @property
    def input_dim(self):
        return self._input_dim


class ImageLearnedCostEstimate(LearnedCostEstimate, ImageCost):
    pass


class ImageWrappedLearnedCostFcn(LearnedCostEstimate, ImageCost):
    """Unpacks image+latent rollouts, scores latents against the final latent
    (goal-conditioned prediction, cost_fcn.py:108-117)."""

    def __call__(self, start_enc, goal_enc):
        start_enc = self._split_state_rollout(start_enc).latent_rollout
        # the reference reuses the LAST rollout's full latent sequence as the
        # goal for every rollout (cost_fcn.py:115, goal-cond prediction hack)
        goal_enc = [start_enc[-1] for _ in range(len(start_enc))]
        return LearnedCostEstimate.__call__(self, start_enc, goal_enc)
