"""Shared GCP model core: encoding, length prediction, aux models, loss
assembly (gcp/prediction/models/base_gcp.py:29-375, functional form).

The reference's runtime mode switches (`val_mode` context manager flipping all
ProbabilisticModel children to prior sampling, base_gcp.py:44-53) become
explicit `mode` / `pred_length` arguments threaded through `__call__`:
mode='posterior' (training), 'prior' (validation / planning sampling). RNGs are
flax streams: 'sample' for latent draws.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.losses import LossTerm, l2_loss, total_loss
from video_gcp_tpu.core.schedules import kl_weight_at
from video_gcp_tpu.models.aux_models import (
    CostModel,
    InverseModel,
    LengthPredictor,
    StateRegressor,
)
from video_gcp_tpu.models.nets import (
    MLP,
    ConvDecoder,
    ConvEncoder,
    GaussianLogSigma,
    build_seq_encoder,
)

Array = jnp.ndarray


class MLPEncoder(nn.Module):
    """State-space encoder for use_convs=False models."""

    hp: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array):
        hp = self.hp
        e = MLP(hp["nz_enc"], hp["nz_mid"], hp["n_processing_layers"], self.dtype)(x)
        return e, None


class MLPDecoder(nn.Module):
    """State-space decoder for use_convs=False models."""

    hp: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, e: Array, skips=None) -> Array:
        hp = self.hp
        return MLP(hp["input_nc"], hp["nz_mid"], hp["n_processing_layers"],
                   self.dtype)(e)


class BaseGCPModel(nn.Module):
    """Common setup + helpers; subclasses implement setup()/predict_sequence."""

    hp: dict
    dtype: Any = jnp.float32

    # ----- shared construction ------------------------------------------------

    # Decoder-side action regression is gated off under the subgoal-prediction
    # planner (base_gcp.py:80)
    @property
    def regress_decoder_actions(self) -> bool:
        return bool(self.hp["regress_actions"]
                    and self.hp.get("one_step_planner") != "sh_pred")

    # Declared-for-parity switches that no published config sets and that are
    # not implemented here: accepted at their defaults, loud otherwise.
    _UNIMPLEMENTED_DEFAULTS = dict(
        pixel_shift_decoder=False,
        add_weighted_pixel_copy=False,
        skip_from_parents=False,
        one_hot_attn_time_cond=False,
        regress_index=False,
        train_on_action_seqs=False,
        supervised_decoder=False,
        states_inference=False,
        standardize=None,
        supervise_match_weight=0.0,
        dump_encodings="",
        dump_encodings_inv_model="",
        log_cartgripper=False,
        log_d2b_3x3maze=0,
    )

    @classmethod
    def validate_hparams(cls, hp):
        """Fail loudly on declared-but-unimplemented or invalid switches
        instead of silently ignoring them (config-hygiene rule)."""
        for flag, default in cls._UNIMPLEMENTED_DEFAULTS.items():
            if hp.get(flag, default) != default:
                raise NotImplementedError(
                    f"hparam {flag}={hp[flag]!r} is declared for config "
                    "parity but not implemented in video_gcp_tpu (no "
                    "published config sets it); keep it at its default "
                    f"{default!r} or pop it from the config")
        if hp.get("var_inf", "standard") == "2layer":
            raise NotImplementedError(
                "var_inf='2layer' (and nz_vae2) is not implemented; use "
                "'standard' or 'deterministic'")
        if hp.get("dense_rec_type", "none") not in (
                "none", "svg", "node_prob", None):
            raise ValueError(
                f"unknown dense_rec_type {hp['dense_rec_type']!r}")
        if hp.get("one_step_planner", "discrete") not in (
                "discrete", "continuous", "sh_pred"):
            raise ValueError(
                f"unknown one_step_planner {hp['one_step_planner']!r}")
        if hp.get("action_activation") not in (None, "sigmoid", "tanh"):
            raise ValueError(
                f"unknown action_activation {hp['action_activation']!r}")

    def apply_action_activation(self, actions: Array) -> Array:
        act = self.hp.get("action_activation")
        if act == "sigmoid":
            return jax.nn.sigmoid(actions)
        if act == "tanh":
            return jnp.tanh(actions)
        return actions

    def setup_core(self):
        hp = self.hp
        self.validate_hparams(hp)
        self.use_dlm = (hp["use_convs"] and hp.get("decoder_distribution")
                        == "discrete_logistic_mixture")
        if hp["use_convs"]:
            self.encoder = ConvEncoder(hp, dtype=self.dtype)
            if self.use_dlm:
                from video_gcp_tpu.models.dlm import n_dlm_channels

                self.decoder = ConvDecoder(
                    hp, dtype=self.dtype,
                    out_channels=n_dlm_channels(hp["input_nc"]),
                    tanh_out=False,
                )
            else:
                self.decoder = ConvDecoder(hp, dtype=self.dtype)
        else:
            self.encoder = MLPEncoder(hp, dtype=self.dtype)
            self.decoder = MLPDecoder(hp, dtype=self.dtype)
        if hp.get("separate_cnn_start_goal_encoder", False):
            # dedicated start/goal encoder (hyperparameters.py:68); the
            # sequence encoder stays shared
            self.start_goal_encoder = (ConvEncoder(hp, dtype=self.dtype)
                                       if hp["use_convs"]
                                       else MLPEncoder(hp, dtype=self.dtype))
        else:
            self.start_goal_encoder = self.encoder
        self.log_sigma_mod = GaussianLogSigma(hp)

        self.inf_encoder = build_seq_encoder(hp, self.dtype)  # may be None
        self.inf_key_encoder = build_seq_encoder(hp, self.dtype)
        if hp.get("act_cond_inference", False):
            # action-conditioned inference: fuse (zero-padded) actions into
            # the temporal inference encoding (ActionConditioningWrapper,
            # auxilliary_models/misc.py:59-70)
            self.act_cond_net = MLP(hp["nz_enc"], hp["nz_mid"],
                                    hp["n_processing_layers"], self.dtype)

        if hp["regress_length"]:
            self.length_pred = LengthPredictor(hp, dtype=self.dtype)
        if hp["attach_inv_mdl"]:
            inv_p = dict(nz_mid=hp["nz_mid"], n_processing_layers=hp["n_processing_layers"])
            inv_p.update(hp["inv_mdl_params"])
            self.inv_mdl = InverseModel(inv_p, dtype=self.dtype)
        if hp["attach_cost_mdl"]:
            cost_p = dict(nz_mid=hp["nz_mid"], n_processing_layers=hp["n_processing_layers"])
            cost_p.update({k: v for k, v in hp["cost_mdl_params"].items()
                           if not callable(v)})
            self.cost_mdl = CostModel(cost_p, dtype=self.dtype)
        if hp["attach_state_regressor"]:
            self.state_regressor = StateRegressor(hp, dtype=self.dtype)
        if hp["action_conditioned_pred"]:
            self.action_encoder = MLP(hp["nz_enc"], hp["nz_mid"],
                                      hp["n_processing_layers"], self.dtype)

    # ----- shared forward pieces ---------------------------------------------

    def preprocess_inputs(self, inputs: AttrDict) -> AttrDict:
        """uint8 image batches -> [-1, 1] floats on device, then
        non_goal_conditioned zeroing (base_gcp.py:163-175)."""
        from video_gcp_tpu.core.metrics import to_float_images

        hp = self.hp
        inputs = inputs.copy()
        for key in ("traj_seq", "I_0", "I_g"):
            if key in inputs:
                inputs[key] = to_float_images(inputs[key])
        if hp["non_goal_conditioned"]:
            if "traj_seq" in inputs:
                b = inputs.traj_seq.shape[0]
                zero_goal = inputs.traj_seq.at[jnp.arange(b), inputs.end_ind].set(0.0)
                inputs.traj_seq = zero_goal
            inputs.I_g = jnp.zeros_like(inputs.I_g)
        if "start_ind" not in inputs:
            inputs.start_ind = jnp.zeros_like(inputs.end_ind)
        return inputs

    def run_encoder(self, inputs: AttrDict) -> AttrDict:
        """Encode the sequence + start/goal frames (base_gcp.py:184-213)."""
        hp = self.hp
        if "traj_seq" in inputs and "enc_traj_seq" not in inputs:
            seq = inputs.traj_seq
            b, t = seq.shape[:2]
            flat = seq.reshape((b * t,) + seq.shape[2:])
            enc, _ = self.encoder(flat)
            inputs.enc_traj_seq = enc.reshape(b, t, -1)
        if "enc_traj_seq" in inputs:
            if self.inf_encoder is not None:
                inputs.inf_enc_seq = self.inf_encoder(inputs.enc_traj_seq)
            else:
                inputs.inf_enc_seq = inputs.enc_traj_seq
            if hp.get("act_cond_inference", False):
                # actions are [B, T-1, n_actions]; zero-pad the final step
                # like the reference (misc.py:66-69) before fusing
                acts = inputs.actions
                pad_t = inputs.inf_enc_seq.shape[1] - acts.shape[1]
                acts = jnp.pad(acts, ((0, 0), (0, max(pad_t, 0)), (0, 0)))
                inputs.inf_enc_seq = self.act_cond_net(
                    inputs.inf_enc_seq, acts[:, :inputs.inf_enc_seq.shape[1]])
            if self.inf_key_encoder is not None:
                inputs.inf_enc_key_seq = self.inf_key_encoder(inputs.enc_traj_seq)
            else:
                inputs.inf_enc_key_seq = inputs.enc_traj_seq

        e_0, skips = self.start_goal_encoder(inputs.I_0)
        inputs.e_0 = e_0
        inputs.skips = skips
        inputs.e_g = self.start_goal_encoder(inputs.I_g)[0]

        if hp["action_conditioned_pred"] and "actions" in inputs:
            inputs.enc_action_seq = self.action_encoder(inputs.actions)
        return inputs

    def get_end_ind(self, inputs: AttrDict, outputs: AttrDict,
                    pred_length: bool, rng) -> Array:
        """Optionally predict sequence length (base_gcp.py:215-229)."""
        hp = self.hp
        end_ind = inputs.get("end_ind", None)
        if hp["regress_length"]:
            outputs.update(self.length_pred(inputs.e_0, inputs.e_g, rng))
            if pred_length and (hp["length_pred_weight"] > 0 or end_ind is None):
                end_ind = outputs.end_ind_pred
                if hp["action_conditioned_pred"] or hp["non_goal_conditioned"]:
                    end_ind = jnp.full_like(end_ind, hp["max_seq_len"] - 1)
        outputs.end_ind = end_ind
        return end_ind

    def decode_seq(self, e_seq: Array, skips):
        """Decode a [B, N, nz_enc] latent sequence to frames, folding the node
        axis into batch so XLA sees one big conv (base_gcp design stance).

        :return: (images [B, N, H, W, C], dlm_params or None). Under the
            discrete-logistic-mixture decoder, `images` is the mixture mean
            (deterministic decode for logging/planning/matching) and the raw
            params feed the NLL."""
        b, n = e_seq.shape[:2]
        flat = e_seq.reshape(b * n, -1)
        out = self.decoder(flat, skips)
        out = out.reshape((b, n) + out.shape[1:])
        if getattr(self, "use_dlm", False):
            from video_gcp_tpu.models import dlm

            return dlm.mean(out, self.hp["input_nc"]), out
        return out, None

    def log_sigma(self) -> Array:
        return self.log_sigma_mod()

    # ----- aux models ---------------------------------------------------------

    def run_aux_models(self, inputs: AttrDict, outputs: AttrDict, phase: str,
                       rng) -> AttrDict:
        """Inverse/cost/state-regressor on the matched latent timeline
        (base_gcp.py:234-262).

        The reference builds ragged pruned sequences; we use the fixed [B, T]
        matched latent timeline (per-frame argmax node latent or the dense VRNN
        latents), with pad-mask weighting standing in for raggedness.
        """
        hp = self.hp
        aux = AttrDict()
        if "model_enc_seq" not in inputs:
            return aux
        enc_seq = inputs.model_enc_seq  # [B, T, D]

        if hp["attach_inv_mdl"] and phase == "train":
            if hp.get("train_inv_mdl_full_seq", False):
                detached = jax.lax.stop_gradient(enc_seq)
                aux.actions = self.inv_mdl(detached[:, :-1], detached[:, 1:])
            else:
                # pair-sampling mode (the reference's training default,
                # inverse_mdl.py:85-101): sample (t0, t1 = t0 + delta) with
                # delta in [1, temp_dist], regress the action at t0 from the
                # GT frame encodings
                temp_dist = hp["inv_mdl_params"].get("temp_dist", 1)
                b = enc_seq.shape[0]
                r1, r2 = jax.random.split(jax.random.fold_in(rng, 7))
                max_t0 = jnp.maximum(
                    inputs.end_ind.astype(jnp.float32) - temp_dist, 0.0
                )
                t0 = (jax.random.uniform(r1, (b,)) * (max_t0 + 1.0)).astype(
                    jnp.int32
                )
                delta = 1 + (jax.random.uniform(r2, (b,)) * temp_dist).astype(
                    jnp.int32
                )
                t1 = t0 + delta
                src = jax.lax.stop_gradient(inputs.enc_traj_seq)

                def g(x, idx):
                    return jnp.take_along_axis(
                        x, idx.reshape((b,) + (1,) * (x.ndim - 1)), axis=1
                    )[:, 0]

                aux.pair_action = self.inv_mdl(g(src, t0), g(src, t1))[:, None]
                aux.pair_action_target = g(inputs.actions, t0)[:, None]
        if hp["attach_state_regressor"]:
            aux.regressed_state = self.state_regressor(
                jax.lax.stop_gradient(enc_seq)
            )
        if hp["attach_cost_mdl"] and hp["run_cost_mdl"] and phase == "train":
            start, end, gt_cost = CostModel.sample_targets(
                rng, enc_seq, inputs.traj_seq, inputs.end_ind
            )
            aux.cost = self.cost_mdl(start, end)
            aux.cost_target = gt_cost
        return aux

    # ----- losses -------------------------------------------------------------

    def aux_losses(self, inputs: AttrDict, outputs: AttrDict) -> AttrDict:
        hp = self.hp
        losses = AttrDict()
        if hp["regress_length"] and "seq_len_logits" in outputs:
            losses.update(
                LengthPredictor.loss(outputs, inputs.end_ind,
                                     hp["length_pred_weight"])
            )
        if "actions" in outputs and "actions" in inputs:
            losses.update(
                InverseModel.loss(outputs.actions, inputs.actions,
                                  inputs.pad_mask)
            )
        if "pair_action" in outputs:
            losses.action_reconst = l2_loss(
                outputs.pair_action, outputs.pair_action_target
            )
        if "cost" in outputs:
            losses.update(CostModel.loss(outputs.cost, outputs.cost_target))
        if "regressed_state" in outputs and "traj_seq_states" in inputs:
            reg_len = outputs.regressed_state.shape[1]
            losses.state_regression = l2_loss(
                outputs.regressed_state,
                inputs.traj_seq_states[:, :reg_len],
                weights=inputs.pad_mask[:, :reg_len, None],
            )
        return losses

    def kl_weight(self, step) -> Array:
        return kl_weight_at(step, self.hp["kl_weight"],
                            self.hp.get("kl_weight_burn_in", None))

    def assemble_total(self, inputs: AttrDict, losses: AttrDict) -> AttrDict:
        """total = sum(w*v) / prod(traj_seq.shape[1:]) (base_gcp.py:294-304);
        nll = img_rec + kl logged at weight 0 (base_gcp.py:289-290)."""
        if "dense_img_rec" in losses and "kl" in losses:
            losses.nll = LossTerm(
                value=losses.dense_img_rec.value + losses.kl.value, weight=0.0
            )
        numel = 1
        for s in inputs.traj_seq.shape[1:]:
            numel *= s
        losses.total = LossTerm(value=total_loss(losses, numel), weight=0.0)
        return losses
