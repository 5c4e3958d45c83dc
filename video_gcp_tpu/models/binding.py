"""Node-to-frame binding: how predicted tree nodes attach to GT frames.

- BalancedBinding (gcp/prediction/models/tree/frame_binding.py:37-99): fixed
  midpoint schedule. Match distributions are one-hot at the truncated balanced
  timestep (closed form, ops.tree_index.balanced_timesteps), with collisions
  against parent timesteps zeroed exactly as the reference does. An existence
  predictor learns which nodes are real frames for pruning.

- AdaptiveBinding (gcp/prediction/models/adaptive_binding/adaptive.py:17-135):
  cost matrix = batched cdist between node images/latents and GT frames
  (detached), temperature-scaled, pushed through the soft-DTW posterior
  (ops.soft_dtw). Reconstruction is the expected Gaussian NLL of every node
  against every frame weighted by the match distribution
  (binding_loss.LossAveragingCriterion). A learned distance predictor prunes
  near-duplicate frames.

Pruning here returns fixed-shape boolean keep-masks [B, N] over df-ordered
nodes (the reference materializes ragged Python lists, frame_binding.py:67-78;
ragged extraction happens only at host/eval edges in this framework).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.distributions import normalize
from video_gcp_tpu.core.losses import bce_logits_loss, penalty_loss
from video_gcp_tpu.models.nets import MLP
from video_gcp_tpu.ops.cdist import batch_cdist
from video_gcp_tpu.ops.soft_dtw import soft_dtw, soft_dtw_stability_gap
from video_gcp_tpu.ops.tree_index import (
    balanced_timesteps,
    breadthfirst2depthfirst,
    depthfirst2breadthfirst,
)

Array = jnp.ndarray


def balanced_match_dists(depth: int, end_ind: Array, max_seq_len: int) -> Array:
    """One-hot match distributions of the balanced schedule, bf order.

    Reproduces BalancedBinding.__call__ (frame_binding.py:42-50): node
    timestep = midpoint recursion from virtual parents (-1, end+1), one-hot at
    trunc(timestep), zeroed where the node's float timestep equals a parent's
    truncated timestep (duplicate-frame collision in short sequences).
    :return: [B, 2^depth - 1, max_seq_len]
    """
    ts = balanced_timesteps(depth, end_ind)  # [B, N] float, bf order
    ts_long = jnp.trunc(ts).astype(jnp.int32)
    one_hot = jax.nn.one_hot(ts_long, max_seq_len, dtype=jnp.float32)

    # parent timesteps per bf node: walk levels; root parents are -1 / end+1
    b = end_ind.shape[0]
    n = 2 ** depth - 1
    t_l = [jnp.full((b, 1), -1.0)]
    t_r = [end_ind.astype(jnp.float32)[:, None] + 1.0]
    for d in range(1, depth):
        prev_l, prev_r = t_l[-1], t_r[-1]
        prev_mid = ts[:, 2 ** (d - 1) - 1 : 2 ** d - 1]
        # children: left child parents (t_l, mid), right child (mid, t_r)
        new_l = jnp.stack([prev_l, prev_mid], 2).reshape(b, -1)
        new_r = jnp.stack([prev_mid, prev_r], 2).reshape(b, -1)
        t_l.append(new_l)
        t_r.append(new_r)
    t_l = jnp.concatenate(t_l, 1)
    t_r = jnp.concatenate(t_r, 1)

    collide = (jnp.trunc(t_l) == ts) | (jnp.trunc(t_r) == ts)
    return jnp.where(collide[:, :, None], 0.0, one_hot)


class BalancedBinding(nn.Module):
    hp: dict
    dtype: Any = jnp.float32

    def setup(self):
        self.existence_predictor = MLP(
            1, self.hp["nz_mid"], self.hp["n_processing_layers"], self.dtype
        )

    def get_w(self, inputs: AttrDict, outputs: AttrDict) -> Array:
        return balanced_match_dists(
            self.hp["hierarchy_levels"], inputs.end_ind, self.hp["max_seq_len"]
        )

    def reconstruction_loss(self, inputs, outputs, log_sigma) -> AttrDict:
        """Gaussian NLL of the matched (per-frame) node estimate vs GT
        (frame_binding.py:88-99): soft_matched = sum_n w[n, t] * value[n]."""
        from video_gcp_tpu.core.losses import gaussian_nll_loss

        w = outputs.gt_match_dists  # [B, N, T]
        images = outputs.tree.images  # [B, N, H, W, C] (bf)

        # per-frame matched node via argmax over the node axis
        # (BaseBinding.get_matched_sequence, frame_binding.py:28-34)
        idx = jnp.argmax(w, axis=1)  # [B, T]

        def gather(x):
            return jnp.take_along_axis(
                x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
            )

        estimates = gather(images)
        outputs.soft_matched_estimates = jax.lax.stop_gradient(estimates)

        if outputs.tree.get("dlm_params") is not None:
            # discrete-logistic-mixture decoder: NLL of the matched node's
            # distribution ('distr' in the reference) against the GT frame
            from video_gcp_tpu.models import dlm

            nll_mat = dlm.nll(gather(outputs.tree.dlm_params),
                              inputs.traj_seq)
            wts = inputs.pad_mask[:, :, None, None]
            return AttrDict(
                dense_img_rec=penalty_loss(
                    nll_mat * wts, weight=self.hp["dense_img_rec_weight"],
                    breakdown=1, reduction=[-1, -2],
                )
            )

        weights = inputs.pad_mask.reshape(
            inputs.pad_mask.shape + (1,) * (inputs.traj_seq.ndim - 2)
        )
        return AttrDict(
            dense_img_rec=gaussian_nll_loss(
                estimates,
                inputs.traj_seq,
                log_sigma,
                weights=weights,
                weight=self.hp["dense_img_rec_weight"],
                breakdown=1,
            )
        )

    def prune_logits(self, outputs) -> Array:
        """Existence logits per df node (frame_binding.py:67-78)."""
        latents_df = breadthfirst2depthfirst(outputs.tree.e_g_prime)
        return self.existence_predictor(latents_df)[..., 0]

    def prune_mask(self, outputs) -> Array:
        """[B, N] keep-mask over df nodes; first frame always kept."""
        logits = self.prune_logits(outputs)
        keep = jax.nn.sigmoid(logits) > 0.5
        return keep.at[:, 0].set(True)

    def loss(self, inputs, outputs) -> AttrDict:
        losses = AttrDict()
        if "existence_logits" in outputs:
            target = breadthfirst2depthfirst(outputs.gt_match_dists).sum(2)
            losses.existence_predictor = bce_logits_loss(
                outputs.existence_logits, target
            )
        return losses


class AdaptiveBinding(nn.Module):
    hp: dict
    dtype: Any = jnp.float32

    def setup(self):
        # soft-DTW with no-horizontal transitions needs >= 1 node per frame;
        # surface the constraint here at model build instead of as a shape
        # assert deep in the loss (ops/soft_dtw.py)
        n_nodes = 2 ** self.hp["hierarchy_levels"] - 1
        if n_nodes < self.hp["max_seq_len"]:
            raise ValueError(
                f"adaptive (soft-DTW) matching requires 2^hierarchy_levels-1 "
                f">= max_seq_len nodes, got {n_nodes} nodes for "
                f"max_seq_len={self.hp['max_seq_len']}; raise "
                f"hierarchy_levels to >= "
                f"{int(np.ceil(np.log2(self.hp['max_seq_len'] + 1)))}"
            )
        self.distance_predictor = MLP(
            1, self.hp["nz_mid"], self.hp["n_processing_layers"], self.dtype
        )

    def matching_temp(self, step) -> Array:
        hp = self.hp
        if hp.get("learn_matching_temp", True):
            return jnp.exp(
                self.param(
                    "log_temp",
                    lambda k: jnp.full((), float(np.log(hp["matching_temp"]))),
                )
            )
        from video_gcp_tpu.core.schedules import matching_temp_at

        return matching_temp_at(
            step,
            hp["matching_temp"],
            hp.get("matching_temp_tenthlife", -1),
            hp.get("matching_temp_min", 1e-3),
        )

    def get_w(self, inputs: AttrDict, outputs: AttrDict, step=0) -> Array:
        """Soft-DTW posterior over node-frame matches (adaptive.py:32-60).

        Returns bf-ordered [B, N, T]; cost is detached (no gradient through
        the DTW), frames normalized over nodes.
        """
        hp = self.hp
        if hp["matching_type"] == "dtw_image":
            nodes_df = breadthfirst2depthfirst(outputs.tree.images)
            cost = batch_cdist(nodes_df, inputs.traj_seq, reduction="mean")
        elif hp["matching_type"] == "dtw_latent":
            nodes_df = breadthfirst2depthfirst(outputs.tree.e_g_prime)
            cost = batch_cdist(nodes_df, inputs.enc_traj_seq, reduction="mean")
        else:
            raise ValueError(f"unknown matching_type {hp['matching_type']!r}")

        cost = self._hack_weights_df(cost)
        temp = self.matching_temp(step)
        w = soft_dtw(jax.lax.stop_gradient(cost) / temp, inputs.end_ind)
        # runtime stability diagnostic (probabilistic_dtw.py:118-120): raw
        # forward-backward marginals should sum to ~1 over frames per node;
        # drift measures f32 DP degradation over a long run. Logged as a
        # weight-0 loss term by the tree model.
        outputs.soft_dtw_stability_gap = soft_dtw_stability_gap(
            w, inputs.end_ind
        )
        w = normalize(w, 1)
        return depthfirst2breadthfirst(w)

    def _hack_weights_df(self, cost: Array) -> Array:
        """Top-bias on the first layers' nodes in df order
        (binding_loss.WeightsHacker.hack_weights_df:81-91)."""
        hp = self.hp
        if hp.get("top_bias", 1.0) == 1.0:
            return cost
        n_top_layers = int(np.log2(hp["n_top_bias_nodes"] + 1))
        depth = int(np.log2(cost.shape[1] + 1))
        m = np.ones(cost.shape[1], dtype=np.float32)
        for l in range(n_top_layers):
            m[2 ** (depth - l - 1) - 1 :: 2 ** (depth - l)] = hp["top_bias"]
        return cost * jnp.asarray(m)[None, :, None]

    def _hack_weights_bf(self, weights: Array) -> Array:
        """leaves/top bias on bf-ordered per-node weights
        (binding_loss.WeightsHacker.hack_weights:67-78)."""
        hp = self.hp
        max_seq_len = hp["max_seq_len"]
        if abs(hp.get("leaves_bias", 0.0)) > 0.0:
            w1 = weights[:, : -max_seq_len]
            w2 = weights[:, -max_seq_len:] * (1 - hp["leaves_bias"])
            weights = jnp.concatenate([w1, w2], 1)
        if hp.get("top_bias", 1.0) != 1.0:
            n = hp["n_top_bias_nodes"]
            weights = jnp.concatenate(
                [weights[:, :n] * hp["top_bias"], weights[:, n:]], 1
            )
        return weights

    def reconstruction_loss(self, inputs, outputs, log_sigma) -> AttrDict:
        """Expected Gaussian NLL of every node against every frame weighted by
        the match distribution (binding_loss.LossAveragingCriterion.loss:19-42).

        The all-pairs expected likelihood relies on the Gaussian cdist
        factorization; adaptive matching therefore requires the Gaussian
        decoder (the published gcp_adaptive config uses it)."""
        assert outputs.tree.get("dlm_params") is None, (
            "adaptive binding requires decoder_distribution='gaussian'"
        )
        predictions = outputs.tree.images  # [B, N, ...] bf
        targets = inputs.traj_seq  # [B, T, ...]
        w = outputs.gt_match_dists  # [B, N, T] bf

        loss_val = batch_cdist(predictions, targets, reduction="sum")  # [B,N,T]
        log_sigmas = log_sigma - jnp.log(
            self._hack_weights_bf(jnp.ones_like(loss_val))
        )
        n = np.prod(predictions.shape[2:])
        loss_val = 0.5 * loss_val * jnp.exp(-2.0 * log_sigmas) + n * (
            log_sigmas + 0.5 * np.log(2 * np.pi)
        )
        match_weights = w * inputs.pad_mask[:, None]
        loss_val = loss_val * match_weights

        outputs.soft_matched_estimates = jax.lax.stop_gradient(
            jnp.einsum("bnt,bn...->bt...", w, predictions)
        )
        return AttrDict(
            dense_img_rec=penalty_loss(
                loss_val,
                weight=self.hp["dense_img_rec_weight"],
                breakdown=2,
                reduction=[-1, -2],
            )
        )

    def prune_logits(self, outputs) -> Array:
        """Distance-predictor logits between consecutive df nodes
        (adaptive.py:62-77): true = frames too close (prune the later one)."""
        latents_df = breadthfirst2depthfirst(outputs.tree.e_g_prime)
        return self.distance_predictor(
            latents_df[:, :-1], latents_df[:, 1:]
        )[..., 0]

    def prune_mask(self, outputs) -> Array:
        logits = outputs.get("distance_logits", self.prune_logits(outputs))
        close = jax.nn.sigmoid(logits) > self.hp.get(
            "learned_pruning_threshold", 0.5
        )
        keep = jnp.concatenate(
            [jnp.ones_like(close[:, :1]), ~close], axis=1
        )
        return keep

    def loss(self, inputs, outputs) -> AttrDict:
        losses = AttrDict()
        if "distance_logits" in outputs:
            df_match = breadthfirst2depthfirst(outputs.gt_match_dists)
            best = jnp.argmax(df_match, axis=-1)
            target = (best[:, 1:] == best[:, :-1]).astype(jnp.float32)
            losses.distance_predictor = bce_logits_loss(
                outputs.distance_logits, target
            )
        return losses
