"""Auxiliary models attached to the predictor (SURVEY.md §2.6).

- LengthPredictor: categorical p(T | e_0, e_g) with CE loss
  (auxilliary_models/misc.py:38-56).
- InverseModel: actions from latent pairs, pair-sampling or full-seq mode
  (auxilliary_models/inverse_mdl.py:15-229).
- CostModel: learned cost(start, end) regressed onto GT path length between
  randomly sampled index pairs (auxilliary_models/cost_mdl.py:14-121,
  vectorized `_fast_path_dist_cost`).
- StateRegressor: MLP from node latents to states (base_gcp.py:93-95).
- BCModel: goal-conditioned behavioral-cloning policy (bc_mdl.py).

All sampling is explicit-PRNG; all losses are fixed-shape with pad-mask
weighting (no ragged batches).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.losses import ce_logits_loss, l2_loss
from video_gcp_tpu.models.nets import MLP

Array = jnp.ndarray


class LengthPredictor(nn.Module):
    """p(seq_len | e_0, e_g) as logits over max_seq_len."""

    hp: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, e_0: Array, e_g: Array, rng=None) -> AttrDict:
        hp = self.hp
        logits = MLP(hp["max_seq_len"], hp["nz_mid"], hp["n_processing_layers"],
                     self.dtype)(e_0, e_g)
        out = AttrDict(seq_len_logits=logits)
        if rng is None:
            sampled = jnp.argmax(logits, axis=-1)
        else:
            sampled = jax.random.categorical(rng, logits, axis=-1)
        # min predicted length >= 3 for planning (base_gcp.py:223)
        out.end_ind_pred = jnp.maximum(sampled, 2)
        return out

    @staticmethod
    def loss(outputs: AttrDict, end_ind: Array, weight: float) -> AttrDict:
        return AttrDict(
            seq_len=ce_logits_loss(outputs.seq_len_logits, end_ind, weight=weight)
        )


class InverseModel(nn.Module):
    """action_t = MLP(e_t, e_{t+1}); full-sequence mode over matched latents."""

    hp: dict  # inv_mdl_params merged over its own defaults
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, enc_seq_0: Array, enc_seq_1: Array) -> Array:
        """:param enc_seq_0/1: [B, T-1, D] consecutive latent pairs (detached
        by the caller unless finetune_enc)."""
        p = self.hp
        return MLP(p["n_actions"], p.get("nz_mid", 32),
                   p.get("n_processing_layers", 3), self.dtype)(
            enc_seq_0, enc_seq_1
        )

    @staticmethod
    def loss(actions_pred: Array, actions_gt: Array, pad_mask: Array,
             weight: float = 1.0) -> AttrDict:
        n = actions_pred.shape[1]
        w = pad_mask[:, :n, None]
        return AttrDict(
            action_reconst=l2_loss(actions_pred, actions_gt[:, :n], weights=w,
                                   weight=weight)
        )


class CostModel(nn.Module):
    """cost(e_start, e_end) -> scalar; trained on path-length targets."""

    hp: dict  # cost_mdl_params merged over its own defaults
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, enc_start: Array, enc_end: Array) -> Array:
        p = self.hp
        return MLP(1, p.get("nz_mid", 128), p.get("n_processing_layers", 3),
                   self.dtype)(enc_start, enc_end)

    @staticmethod
    def sample_targets(rng, model_enc_seq: Array, traj_seq: Array,
                       end_ind: Array):
        """Vectorized GT path-distance cost between random index pairs
        (cost_mdl.py:82-100): cost = cumulative state-space path length from
        start_idx to end_idx."""
        b = end_ind.shape[0]
        r1, r2 = jax.random.split(rng)
        u1 = jax.random.uniform(r1, (b,))
        u2 = jax.random.uniform(r2, (b,))
        start_idx = (u1 * (end_ind.astype(jnp.float32) - 1.0)).astype(jnp.int32)
        end_f = u2 * (end_ind.astype(jnp.float32) - (start_idx + 1)) + (
            start_idx + 1
        )
        end_idx = end_f.astype(jnp.int32)

        def gather_t(x, idx):
            return jnp.take_along_axis(
                x, idx.reshape((b,) + (1,) * (x.ndim - 1)), axis=1
            )[:, 0]

        start = jax.lax.stop_gradient(gather_t(model_enc_seq, start_idx))
        end = jax.lax.stop_gradient(gather_t(model_enc_seq, end_idx))

        flat = traj_seq.reshape(traj_seq.shape[:2] + (-1,))
        step_len = jnp.linalg.norm(flat[:, 1:] - flat[:, :-1], axis=-1)
        cum = jnp.concatenate(
            [jnp.zeros((b, 1), step_len.dtype), jnp.cumsum(step_len, axis=1)], 1
        )
        gt_cost = gather_t(cum, end_idx) - gather_t(cum, start_idx)
        return start, end, jax.lax.stop_gradient(gt_cost[:, None])

    @staticmethod
    def loss(cost_pred: Array, cost_target: Array) -> AttrDict:
        return AttrDict(cost_estimation=l2_loss(cost_pred, cost_target))


class StateRegressor(nn.Module):
    """3-layer MLP from (detached) node latents to states (base_gcp.py:93-95)."""

    hp: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latents: Array) -> Array:
        hp = self.hp
        return MLP(hp["state_dim"], hp["nz_mid"], hp["n_processing_layers"],
                   self.dtype)(latents)


class BCModel(nn.Module):
    """Goal-conditioned behavioral cloning: action from (e_t, e_g)
    (bc_mdl.py reactive MLP variant; the LSTM variant threads a recurrent
    state through `carry`)."""

    hp: dict
    recurrent: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, e_t: Array, e_g: Array, carry=None):
        p = self.hp
        if not self.recurrent:
            act = MLP(p["n_actions"], p.get("nz_mid", 32),
                      p.get("n_processing_layers", 3), self.dtype)(e_t, e_g)
            return act, None
        size = p.get("nz_mid_lstm", 32)
        cell = nn.OptimizedLSTMCell(size, dtype=self.dtype)
        if carry is None:
            carry = cell.initialize_carry(
                jax.random.PRNGKey(0), e_t.shape[:-1] + (size,)
            )
        x = jnp.concatenate([e_t, e_g], -1).astype(self.dtype)
        carry, out = cell(carry, x)
        act = nn.Dense(p["n_actions"], dtype=self.dtype)(out)
        return act.astype(jnp.float32), carry
