"""GCP-tree: hierarchical goal-conditioned predictor as a level-parallel scan.

The core model of the framework (reference: gcp/prediction/models/tree/
tree.py, tree_module.py, tree_utils.py). The reference expands the binary
subgoal tree by Python recursion over per-level node objects
(SubgoalTreeLayer.produce_tree, tree_utils.py:21-44); here the tree is a dense
breadth-first tensor [B, 2^L - 1, ...] built by an unrolled loop over the L
levels (L <= 9 static), where each level is ONE batched call over all 2^d
nodes: prior -> (inference | prior sample | injected z) -> TreeLSTM subgoal
prediction. Children's parent arrays are built by `interleave` — a reshape, not
data movement XLA can't fuse.

Level d semantics match tree_module.produce_subgoal:67-114 exactly; per-level
parameters can be untied (untied_layers_tree.py) by constructing one TreeLevel
per depth.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.distributions import Gaussian, safe_entropy
from video_gcp_tpu.core.losses import (
    LossTerm, kl_divergence_loss, penalty_loss,
)
from video_gcp_tpu.models.base import BaseGCPModel
from video_gcp_tpu.models.binding import AdaptiveBinding, BalancedBinding
from video_gcp_tpu.models.inference import AttentiveInference, MatchedInference
from video_gcp_tpu.models.nets import FixedPriorHead, GaussianHead, MLP
from video_gcp_tpu.models.tree_lstm import LSTMInitializer, TreeLSTMPredictor
from video_gcp_tpu.ops.tree_index import depthfirst2layers, interleave

Array = jnp.ndarray


class TreeLevel(nn.Module):
    """One recursion step applied to all nodes of a level (TreeModule,
    tree_module.py:19-114). All node-axis args are [B, n, ...]."""

    hp: dict
    dtype: Any = jnp.float32

    def setup(self):
        hp = self.hp
        if hp.get("prior_type", "learned") == "learned":
            self.prior = GaussianHead(hp["nz_vae"], hp["nz_mid"],
                                      hp["n_processing_layers"], self.dtype)
        else:
            self.prior = FixedPriorHead(hp["nz_vae"])

        if hp["attentive_inference"]:
            self.inference = AttentiveInference(hp, dtype=self.dtype)
        else:
            self.inference = MatchedInference(hp, dtype=self.dtype)

        if hp["tree_lstm"]:
            self.subgoal_pred = TreeLSTMPredictor(hp, hp["tree_lstm"],
                                                  dtype=self.dtype)
            self.lstm_initializer = LSTMInitializer(hp, dtype=self.dtype)
        else:
            self.subgoal_pred = MLP(hp["nz_enc"], hp["nz_mid"],
                                    hp["n_processing_layers"], self.dtype,
                                    final_activation="tanh")

    def __call__(
        self,
        inputs: AttrDict,
        e_l: Array,
        e_r: Array,
        hidden_l: Optional[Array],
        hidden_r: Optional[Array],
        t_l: Array,  # match-timestep recursion bounds [B, n]
        t_r: Array,
        z_ext: Optional[Array],  # injected latents [B, n, nz_vae] or None
        mode: str,  # 'posterior' | 'prior'
    ) -> AttrDict:
        hp = self.hp
        sg = AttrDict()
        sg.p_z = self.prior(e_l, e_r)

        timesteps = (t_l + t_r) / 2.0  # comp_timestep (frame_binding.py:52-54)
        sg.match_timesteps = timesteps

        use_inference = (z_ext is None) and (mode == "posterior")
        if use_inference:
            if hp["attentive_inference"]:
                if hp.get("mask_inf_attention", False):
                    s_ind, e_ind = jnp.floor(t_l), jnp.ceil(t_r)
                else:
                    n = e_l.shape[1]
                    s_ind = jnp.broadcast_to(inputs.start_ind[:, None], t_l.shape)
                    e_ind = jnp.broadcast_to(inputs.end_ind[:, None], t_r.shape)
                inf_out = self.inference(
                    inputs.inf_enc_seq, inputs.inf_enc_key_seq, e_l, e_r,
                    s_ind, e_ind,
                )
            else:
                inf_out = self.inference(inputs.inf_enc_seq, e_l, e_r, timesteps)
            sg.update(inf_out)
            z = sg.q_z.sample(self.make_rng("sample"))
        elif z_ext is not None:
            z = z_ext
            if hp.get("prior_type", "learned") == "learned":
                z = sg.p_z.reparametrize(z)  # tree_module.py:81-82
            # dummy q for pytree-uniformity; excluded from loss by caller
            sg.q_z = sg.p_z
        else:
            z = sg.p_z.sample(self.make_rng("sample"))
            sg.q_z = sg.p_z

        pred_inputs = [e_l, e_r, z]
        if hp["context_every_step"]:
            n = e_l.shape[1]
            pred_inputs += [
                jnp.broadcast_to(inputs.e_0[:, None], e_l.shape),
                jnp.broadcast_to(inputs.e_g[:, None], e_r.shape),
            ]

        if hp["tree_lstm"]:
            if hidden_l is None:
                hidden_l, hidden_r = self.lstm_initializer(e_l, e_r, z)
                # expose initialized root-parent states so the caller can
                # interleave them into the next level (the reference mutates
                # the parent AttrDicts in place, tree_module.py:104-105)
                sg.init_hidden_l, sg.init_hidden_r = hidden_l, hidden_r
            sg.hidden_state, sg.e_g_prime = self.subgoal_pred(
                hidden_l, hidden_r, *pred_inputs
            )
        else:
            sg.e_g_prime = self.subgoal_pred(*pred_inputs)
            sg.hidden_state = None

        sg.z = z
        return sg


class TreeModel(BaseGCPModel):
    """Top model: initial nodes from e_0/e_g, level-parallel tree production,
    dense decode, matching, pruning (tree.py:14-124)."""

    def setup(self):
        self.setup_core()
        hp = self.hp
        if self.regress_decoder_actions:
            raise NotImplementedError(
                "decoder action regression (regress_actions with "
                "one_step_planner != 'sh_pred') is only supported by the "
                "sequential model; tree configs use 'sh_pred' (base_tree.py)")
        depth = hp["hierarchy_levels"]
        if hp["untied_layers"]:
            self.tree_levels = [TreeLevel(hp, dtype=self.dtype)
                                for _ in range(depth)]
        else:
            shared = TreeLevel(hp, dtype=self.dtype)
            self.tree_levels = [shared] * depth

        if hp["matching_type"] == "balanced":
            self.binding = BalancedBinding(hp, dtype=self.dtype)
        elif "dtw" in hp["matching_type"]:
            self.binding = AdaptiveBinding(hp, dtype=self.dtype)
        else:
            raise NotImplementedError(hp["matching_type"])

    # ------------------------------------------------------------------

    def predict_sequence(self, inputs: AttrDict, outputs: AttrDict,
                         end_ind: Array, mode: str) -> AttrDict:
        hp = self.hp
        depth = hp["hierarchy_levels"]
        b = inputs.e_0.shape[0]

        # initial (virtual) nodes; match-timestep bounds depend on the binding
        # (BalancedBinding.get_init_inds: (-1, end+1), frame_binding.py:62-65;
        # BaseBinding: (start, end), frame_binding.py:19-20)
        e_l = inputs.e_0[:, None]
        e_r = inputs.e_g[:, None]
        if hp["matching_type"] == "balanced":
            t_l = jnp.full((b, 1), -1.0)
            t_r = end_ind.astype(jnp.float32)[:, None] + 1.0
        else:
            t_l = inputs.start_ind.astype(jnp.float32)[:, None]
            t_r = end_ind.astype(jnp.float32)[:, None]
        hidden_l = hidden_r = None

        z_layers = None
        if "z" in inputs:
            z_layers = depthfirst2layers(inputs.z)

        levels = []
        for d in range(depth):
            sg = self.tree_levels[d](
                inputs, e_l, e_r, hidden_l, hidden_r, t_l, t_r,
                None if z_layers is None else z_layers[d], mode,
            )
            levels.append(sg)
            if d + 1 < depth:
                t_mid = sg.match_timesteps
                e_l, e_r = (
                    interleave(e_l, sg.e_g_prime),
                    interleave(sg.e_g_prime, e_r),
                )
                t_l, t_r = interleave(t_l, t_mid), interleave(t_mid, t_r)
                if hp["tree_lstm"]:
                    if hidden_l is None:
                        hidden_l = sg.init_hidden_l
                        hidden_r = sg.init_hidden_r
                    hidden_l = interleave(hidden_l, sg.hidden_state)
                    hidden_r = interleave(sg.hidden_state, hidden_r)

        # concat per-level outputs into breadth-first node arrays
        tree = AttrDict()
        tree.e_g_prime = jnp.concatenate([l.e_g_prime for l in levels], 1)
        tree.match_timesteps = jnp.concatenate(
            [l.match_timesteps for l in levels], 1
        )
        tree.z = jnp.concatenate([l.z for l in levels], 1)
        tree.q_z = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, 1), *[l.q_z for l in levels]
        )
        tree.p_z = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, 1), *[l.p_z for l in levels]
        )
        if levels[0].get("gamma") is not None:
            tree.gamma = jnp.concatenate([l.gamma for l in levels], 1)

        # dense decode of all 2^L - 1 nodes through the shared decoder
        tree.images, tree.dlm_params = self.decode_seq(tree.e_g_prime,
                                                       inputs.skips)
        outputs.tree = tree
        return outputs

    # ------------------------------------------------------------------

    def __call__(self, inputs: AttrDict, phase: str = "train",
                 mode: str = "posterior", pred_length: bool = False,
                 step=0) -> AttrDict:
        hp = self.hp
        inputs = self.preprocess_inputs(inputs)
        inputs = self.run_encoder(inputs)

        outputs = AttrDict()
        rng_len = self.make_rng("sample") if (hp["regress_length"] and
                                              mode != "posterior") else None
        end_ind = self.get_end_ind(inputs, outputs, pred_length, rng_len)

        self.predict_sequence(inputs, outputs, end_ind, mode)

        # pruning predictions (existence / distance nets; tree.py:59)
        if hp["matching_type"] == "balanced":
            outputs.existence_logits = self.binding.prune_logits(outputs)
        else:
            outputs.distance_logits = self.binding.prune_logits(outputs)
        outputs.prune_keep = self.binding.prune_mask(outputs)

        losses = AttrDict()
        if "traj_seq" in inputs and phase == "train":
            self.compute_matching(inputs, outputs, step)
            losses = self.compute_losses(inputs, outputs, step)
            losses.update(self.binding.loss(inputs, outputs))

            # matched latent timeline feeds the auxiliary models
            w = outputs.gt_match_dists
            idx = jnp.argmax(w, axis=1)  # [B, T] best node per frame
            inputs.model_enc_seq = jnp.take_along_axis(
                outputs.tree.e_g_prime, idx[..., None], axis=1
            )
            aux = self.run_aux_models(
                inputs, outputs, phase,
                self.make_rng("sample")
                if (hp["attach_cost_mdl"] or hp["attach_inv_mdl"]) else None,
            )
            outputs.update(aux)
            losses.update(self.aux_losses(inputs, outputs))
            losses = self.assemble_total(inputs, losses)

        if phase == "plan":
            outputs.update(self.plan_outputs(inputs, outputs))

        outputs.losses = losses
        return outputs

    # ------------------------------------------------------------------

    def plan_outputs(self, inputs: AttrDict, outputs: AttrDict) -> AttrDict:
        """Batched planner-facing outputs: the balanced-schedule GT-timeline
        prediction plus inferred actions / regressed states / latents
        (the contract GCPSimulator.rollout reads, cem_simulator.py:14-43).
        All [B, T, ...] with validity up to outputs.end_ind."""
        hp = self.hp
        from video_gcp_tpu.evaluation.eval_binding import basic_timeline_index

        end_ind = outputs.end_ind
        depth = hp["hierarchy_levels"]
        idx = basic_timeline_index(depth, end_ind, hp["max_seq_len"])

        def gather(x):
            e = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, e, axis=1)

        plan = AttrDict(
            timeline_images=gather(outputs.tree.images),
            timeline_latents=gather(outputs.tree.e_g_prime),
        )
        lat = plan.timeline_latents
        if hp["attach_inv_mdl"]:
            plan.actions = self.inv_mdl(lat[:, :-1], lat[:, 1:])
        if hp["attach_state_regressor"]:
            plan.regressed_state = self.state_regressor(lat)
        return plan

    def compute_matching(self, inputs: AttrDict, outputs: AttrDict, step):
        """Match tree nodes to GT frames (tree_module.py:132-147)."""
        if self.hp["matching_type"] == "balanced":
            w = self.binding.get_w(inputs, outputs)
        else:
            w = self.binding.get_w(inputs, outputs, step)
        outputs.gt_match_dists = w
        outputs.tree.match_dist = w
        outputs.entropy = safe_entropy(w, axis=-1)
        outputs.p_n = jnp.clip(jnp.sum(w, axis=2), 0.0, 1.0)

    def compute_losses(self, inputs: AttrDict, outputs: AttrDict, step) -> AttrDict:
        hp = self.hp
        losses = AttrDict()
        losses.update(
            self.binding.reconstruction_loss(inputs, outputs, self.log_sigma())
        )
        losses.kl = kl_divergence_loss(
            outputs.tree.q_z,
            outputs.tree.p_z,
            weight=self.kl_weight(step),
            free_nats_per_dim=hp["free_nats"],
            breakdown=1,
        )
        losses.entropy = penalty_loss(outputs.entropy,
                                      weight=hp["entropy_weight"])
        if outputs.get("soft_dtw_stability_gap") is not None:
            # weight-0 (log-only) runtime diagnostic: f32 forward-backward
            # marginal drift of the adaptive matcher (probabilistic_dtw.py:
            # 118-120 runs the same check as a hard assert in f64)
            losses.soft_dtw_stability_gap = LossTerm(
                value=outputs.soft_dtw_stability_gap, weight=0.0
            )
        return losses
