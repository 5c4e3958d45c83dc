"""Sequential goal-conditioned predictor (SVG-style VRNN) as a lax.scan.

Rebuilds gcp/prediction/models/sequential.py:13-131 and the blox VRNNCell it
wraps (sequential.py:28: VRNNCell(hp, input_size, context_size, nz_enc*2)).
The reference rolls the cell max_seq_len - 1 steps in Python; here the whole
rollout is one `nn.scan` over time with static length, so XLA compiles a single
fused recurrence. Per step:

    p_z_t = prior(h_t)                     (learned prior from LSTM state)
    q_z_t = q(h_t, x'_t)                   (posterior sees the GT next frame)
    z_t   ~ q (posterior mode) | p (prior mode) | injected (planning)
    h_{t+1}, o_t = LSTM(h_t, [x_t, z_t, context])
    x_{t+1} = tanh(W o_t)                  (next latent frame)

Frames decode through the shared ConvDecoder; the first GT frame I_0 is
prepended (sequential.py:57).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.distributions import Gaussian
from video_gcp_tpu.core.losses import gaussian_nll_loss, kl_divergence_loss
from video_gcp_tpu.models.base import BaseGCPModel
from video_gcp_tpu.models.nets import (
    GaussianHead,
    MLP,
    lstm_state_size,
    make_lstm_stack,
)

Array = jnp.ndarray


class VRNNCell(nn.Module):
    """One VRNN step over packed LSTM state (blox.torch.models.vrnn.VRNNCell)."""

    hp: dict
    dtype: Any = jnp.float32

    def setup(self):
        hp = self.hp
        self.lstm = make_lstm_stack(hp, dtype=self.dtype)
        self.prior_head = GaussianHead(hp["nz_vae"], hp["nz_mid"],
                                       hp["n_processing_layers"], self.dtype)
        self.inf_head = GaussianHead(hp["nz_vae"], hp["nz_mid"],
                                     hp["n_processing_layers"], self.dtype)
        self.out_proj = nn.Dense(hp["nz_enc"], dtype=self.dtype)

    def __call__(self, carry, step_inputs):
        state, x = carry
        x_prime = step_inputs.get("x_prime")  # GT next-frame latent or None
        z_ext = step_inputs.get("z")
        context = step_inputs["context"]
        rng = step_inputs["rng"]
        mode = step_inputs["mode"]

        h_top = self.lstm.top_h(state)  # top-layer h of the packed state
        p_z = self.prior_head(h_top)
        if x_prime is not None:
            q_z = self.inf_head(h_top, x_prime)
        else:
            q_z = p_z

        if z_ext is not None:
            z = p_z.reparametrize(z_ext)
        elif mode == "posterior" and x_prime is not None:
            z = q_z.sample(rng)
        else:
            z = p_z.sample(rng)

        lstm_in = jnp.concatenate([x, z, context], axis=-1)
        new_state, out = self.lstm(state, lstm_in)
        x_next = jnp.tanh(
            self.out_proj(out.astype(self.dtype)).astype(jnp.float32)
        )
        return (new_state, x_next), AttrDict(x=x_next, q_z=q_z, p_z=p_z, z=z)


class SequentialModel(BaseGCPModel):
    """SVG-style dense predictor (SequentialModel/SequentialRecModule)."""

    def setup(self):
        self.setup_core()
        self.cell = VRNNCell(self.hp, dtype=self.dtype)
        self.init_mlp = MLP(
            lstm_state_size(self.hp),
            self.hp["nz_mid"], self.hp["n_processing_layers"], self.dtype,
        )
        if self.regress_decoder_actions:
            # decoder-side action regression (base_gcp.py:80: enabled when
            # regress_actions and not the subgoal-prediction planner)
            self.action_head = MLP(
                self.hp["n_actions"], self.hp["nz_mid"],
                self.hp["n_processing_layers"], self.dtype,
            )

    def predict_sequence(self, inputs: AttrDict, outputs: AttrDict,
                         end_ind: Array, mode: str) -> AttrDict:
        hp = self.hp
        b = inputs.e_0.shape[0]
        t_steps = hp["max_seq_len"] - 1

        context = jnp.concatenate([inputs.e_0, inputs.e_g], axis=-1)
        if hp["action_conditioned_pred"] and "enc_action_seq" in inputs:
            more = inputs.enc_action_seq  # [B, T-1, D], per-step context
        else:
            more = None

        state0 = self.init_mlp(inputs.e_0, context)
        carry0 = (state0, inputs.e_0)

        rngs = jax.random.split(self.make_rng("sample"), t_steps)
        xs = AttrDict(rng=rngs)
        if "enc_traj_seq" in inputs:
            xs.x_prime = jnp.moveaxis(inputs.enc_traj_seq[:, 1:], 1, 0)
        if "z" in inputs:
            # planner-injected latents may arrive with T entries; the rollout
            # consumes T-1 steps (reference slices via length=T-1,
            # sequential.py:50-55)
            xs.z = jnp.moveaxis(inputs.z[:, :t_steps], 1, 0)
        if more is not None:
            xs.more_context = jnp.moveaxis(more[:, :t_steps], 1, 0)

        _, seq_out = self._scan_cell(carry0, xs, context, mode)

        encodings = jnp.moveaxis(seq_out.x, 0, 1)  # [B, T-1, nz_enc]
        outputs.dense_rec = AttrDict(
            encodings=encodings,
            q_z=jax.tree_util.tree_map(lambda v: jnp.moveaxis(v, 0, 1), seq_out.q_z),
            p_z=jax.tree_util.tree_map(lambda v: jnp.moveaxis(v, 0, 1), seq_out.p_z),
        )
        images, dlm_params = self.decode_seq(encodings, inputs.skips)
        outputs.dense_rec.images = jnp.concatenate(
            [inputs.I_0[:, None], images], axis=1
        )
        outputs.dense_rec.dlm_params = dlm_params
        return outputs

    def _scan_cell(self, carry0, xs, context, mode):
        """Unrolled-by-scan cell application with shared params."""

        def body(cell, carry, x_t):
            step_inputs = dict(x_t)
            step_inputs["context"] = (
                jnp.concatenate([context, step_inputs.pop("more_context")], -1)
                if "more_context" in step_inputs
                else context
            )
            step_inputs["mode"] = mode
            step_inputs.setdefault("x_prime", None)
            step_inputs.setdefault("z", None)
            return cell(carry, step_inputs)

        scan_mod = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        return scan_mod(self.cell, carry0, xs)

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

        losses = AttrDict()
        if "traj_seq" in inputs and phase == "train":
            losses = self.compute_losses(inputs, outputs, step)
            inputs.model_enc_seq = jnp.concatenate(
                [inputs.e_0[:, None], outputs.dense_rec.encodings], axis=1
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

    def plan_outputs(self, inputs: AttrDict, outputs: AttrDict) -> AttrDict:
        """Planner-facing dense outputs (cem_simulator contract)."""
        hp = self.hp
        lat = jnp.concatenate(
            [inputs.e_0[:, None], outputs.dense_rec.encodings], axis=1
        )
        plan = AttrDict(
            timeline_images=outputs.dense_rec.images,
            timeline_latents=lat,
        )
        if hp["attach_inv_mdl"]:
            plan.actions = self.inv_mdl(lat[:, :-1], lat[:, 1:])
        if hp["attach_state_regressor"]:
            plan.regressed_state = self.state_regressor(lat)
        return plan

    def compute_losses(self, inputs, outputs, step):
        """Dense reconstruction NLL + per-step KL (sequential.py:60-68)."""
        hp = self.hp
        losses = AttrDict()
        target = inputs.traj_seq[:, 1:]
        if outputs.dense_rec.get("dlm_params") is not None:
            from video_gcp_tpu.core.losses import penalty_loss
            from video_gcp_tpu.models import dlm

            nll_mat = dlm.nll(outputs.dense_rec.dlm_params, target)
            w = inputs.pad_mask[:, 1:, None, None]
            losses.dense_img_rec = penalty_loss(
                nll_mat * w, weight=hp["dense_img_rec_weight"], breakdown=1,
                reduction=[-1, -2],
            )
        else:
            pred = outputs.dense_rec.images[:, 1:]  # first frame is GT I_0
            w = inputs.pad_mask[:, 1:].reshape(
                inputs.pad_mask[:, 1:].shape + (1,) * (target.ndim - 2)
            )
            losses.dense_img_rec = gaussian_nll_loss(
                pred, target, self.log_sigma(), weights=w,
                weight=hp["dense_img_rec_weight"], breakdown=1,
            )
        if self.regress_decoder_actions and "actions" in inputs:
            from video_gcp_tpu.core.losses import l2_loss

            pred_a = self.apply_action_activation(
                self.action_head(outputs.dense_rec.encodings))
            n = min(pred_a.shape[1], inputs.actions.shape[1])
            losses.dense_action_rec = l2_loss(
                pred_a[:, :n], inputs.actions[:, :n],
                weights=inputs.pad_mask[:, 1 : n + 1, None],
                weight=hp["dense_action_rec_weight"],
            )
        kl_w = inputs.pad_mask[:, 1:, None]
        losses.kl = kl_divergence_loss(
            outputs.dense_rec.q_z, outputs.dense_rec.p_z, weights=kl_w,
            weight=self.kl_weight(step), free_nats_per_dim=hp["free_nats"],
            breakdown=1,
        )
        return losses
