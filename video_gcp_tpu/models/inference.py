"""Approximate posteriors q(z | e_l, e_r, evidence) for the subgoal latents.

- MatchedInference: indexes the (optionally temporally encoded) GT latent
  sequence at the node's matching timestep — gcp/prediction/models/tree/
  inference.py:9-43. The gather is a single take_along_axis over the node axis.
- AttentiveInference: multi-head attention of the (e_l, e_r) query over the
  encoded sequence, masked to the active segment — adaptive_binding/
  attentive_inference.py:11-86 (used when hp.attentive_inference, the
  gcp_adaptive config).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.models.nets import (
    MLP,
    FixedPriorHead,
    GaussianHead,
    MaskedMultiheadAttention,
)

Array = jnp.ndarray


def gather_timestep(seq: Array, timesteps: Array) -> Array:
    """seq [B, T, D], timesteps [B, N] float -> [B, N, D] gathered at
    truncated indices (torch .long() truncates toward zero; inference.py:30-33)."""
    t = seq.shape[1]
    idx = jnp.clip(jnp.trunc(timesteps).astype(jnp.int32), 0, t - 1)
    return jnp.take_along_axis(seq, idx[..., :, None], axis=1)


class MatchedInference(nn.Module):
    hp: dict
    dtype: Any = jnp.float32

    def setup(self):
        hp = self.hp
        if hp.get("var_inf", "standard") == "deterministic":
            self.q = FixedPriorHead(hp["nz_vae"])
        else:
            self.q = GaussianHead(hp["nz_vae"], hp["nz_mid"],
                                  hp["n_processing_layers"], self.dtype)

    def __call__(self, inf_enc_seq: Array, e_l: Array, e_r: Array,
                 timesteps: Array) -> AttrDict:
        if self.hp.get("var_inf", "standard") == "deterministic":
            return AttrDict(q_z=self.q(e_l), gamma=None)
        e_tilde = gather_timestep(inf_enc_seq, timesteps)
        return AttrDict(q_z=self.q(e_l, e_r, e_tilde), gamma=None)


class AttentiveInference(nn.Module):
    """Multi-layer attention with query refinement, layer norms and skip
    connections around attention and predictor (attentive_inference.py:47-86).
    Mask: global [start_ind, end_ind] by default; the node's own segment
    (floor(t_l), ceil(t_r)) when hp.mask_inf_attention."""

    hp: dict
    dtype: Any = jnp.float32

    def setup(self):
        hp = self.hp
        if hp.get("var_inf", "standard") == "deterministic":
            self.q = FixedPriorHead(hp["nz_vae"])
        else:
            self.q = GaussianHead(hp["nz_vae"], hp["nz_mid"],
                                  hp["n_processing_layers"], self.dtype)
        n_layers = hp.get("n_attention_layers", 1)
        self.query_net = MLP(hp["nz_attn_key"], hp["nz_mid"],
                             hp["n_processing_layers"], self.dtype)
        self.attention_layers = [
            MaskedMultiheadAttention(hp, dtype=self.dtype) for _ in range(n_layers)
        ]
        self.predictor_layers = [
            MLP(hp["nz_attn_key"], hp["nz_mid"], 2, self.dtype)
            for _ in range(n_layers)
        ]
        self.out = nn.Dense(hp["nz_enc"], dtype=self.dtype)

    def __call__(self, inf_enc_seq: Array, inf_enc_key_seq: Array, e_l: Array,
                 e_r: Array, start_ind: Array, end_ind: Array) -> AttrDict:
        """Node-axis args [B, N, ...]; sequence args [B, T, ...]; start/end_ind
        [B, N] already resolved to the masking bounds by the caller."""
        if self.hp.get("var_inf", "standard") == "deterministic":
            return AttrDict(q_z=self.q(e_l), gamma=None)
        n = e_l.shape[1]
        keys = jnp.broadcast_to(
            inf_enc_key_seq[:, None],
            (inf_enc_key_seq.shape[0], n) + inf_enc_key_seq.shape[1:],
        )
        values = jnp.broadcast_to(
            inf_enc_seq[:, None],
            (inf_enc_seq.shape[0], n) + inf_enc_seq.shape[1:],
        )
        query = self.query_net(e_l, e_r)
        raw, gamma = None, None
        for attn, pred in zip(self.attention_layers, self.predictor_layers):
            raw, gamma = attn(query, keys, values, start_ind, end_ind)
            x = _layer_norm(raw)
            query = _layer_norm(pred(x) + query)
        e_tilde = self.out(raw.astype(self.dtype)).astype(jnp.float32)
        return AttrDict(q_z=self.q(e_l, e_r, e_tilde), gamma=gamma)


def _layer_norm(x: Array) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5)
