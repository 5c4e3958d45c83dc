"""Standalone goal-conditioned behavioral cloning model + training contract.

Reference: gcp/prediction/models/auxilliary_models/bc_mdl.py:15-168. Encodes
frames and the goal, predicts actions from the fused encodings — reactive MLP
or recurrent (LSTM) policy — trained with L2 action reconstruction. Follows
the framework's model contract (__call__(inputs, phase, mode, ...) ->
outputs with .losses) so the standard trainer drives it.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.losses import LossTerm, l2_loss, total_loss
from video_gcp_tpu.models.base import BaseGCPModel
from video_gcp_tpu.models.nets import MLP, ConvEncoder, LSTMStack

Array = jnp.ndarray


class BCModel(BaseGCPModel):
    def setup(self):
        hp = self.hp
        self.encoder = ConvEncoder(hp, dtype=self.dtype)
        if hp.get("reactive", True):
            self.policy = MLP(hp["n_actions"], hp["nz_mid"],
                              hp["n_processing_layers"], self.dtype)
        else:
            self.lstm = LSTMStack(hp["nz_mid_lstm"], hp["n_lstm_layers"],
                                  dtype=self.dtype)
            self.head = nn.Dense(hp["n_actions"], dtype=self.dtype)

    def _encode_seq(self, traj_seq):
        b, t = traj_seq.shape[:2]
        flat = traj_seq.reshape((b * t,) + traj_seq.shape[2:])
        enc, _ = self.encoder(flat)
        return enc.reshape(b, t, -1)

    def __call__(self, inputs: AttrDict, phase: str = "train",
                 mode: str = "posterior", pred_length: bool = False,
                 step=0) -> AttrDict:
        from video_gcp_tpu.core.metrics import to_float_images

        hp = self.hp
        enc_seq = self._encode_seq(to_float_images(inputs.traj_seq))
        enc_goal, _ = self.encoder(to_float_images(inputs.I_g))
        fused = jnp.concatenate(
            [enc_seq,
             jnp.broadcast_to(enc_goal[:, None], enc_seq.shape)], axis=-1
        )
        if hp.get("reactive", True):
            actions = self.policy(fused)
        else:
            b = fused.shape[0]
            state0 = jnp.zeros((b, self.lstm.state_size))

            def body(cell, carry, x):
                new_state, out = cell(carry, x)
                return new_state, out

            scan = nn.scan(body, variable_broadcast="params",
                           split_rngs={"params": False}, in_axes=1, out_axes=1)
            _, outs = scan(self.lstm, state0, fused)
            actions = self.head(outs.astype(self.dtype)).astype(jnp.float32)
        actions = actions[:, :-1]  # last frame has no action

        outputs = AttrDict(actions=actions)
        losses = AttrDict()
        if "actions" in inputs and phase == "train":
            n = actions.shape[1]
            losses.action_reconst = l2_loss(
                actions, inputs.actions[:, :n],
                weights=inputs.pad_mask[:, :n, None],
            )
            numel = 1
            for s in inputs.traj_seq.shape[1:]:
                numel *= s
            losses.total = LossTerm(value=total_loss(losses, numel), weight=0.0)
        outputs.losses = losses
        return outputs

    def act_single(self, I_0: Array, I_g: Array, hidden=None):
        """Single-step action for test-time control (TestTimeBCModel)."""
        e0, _ = self.encoder(I_0)
        eg, _ = self.encoder(I_g)
        fused = jnp.concatenate([e0, eg], axis=-1)
        if self.hp.get("reactive", True):
            return self.policy(fused), None
        if hidden is None:
            hidden = jnp.zeros((I_0.shape[0], self.lstm.state_size))
        new_hidden, out = self.lstm(hidden, fused)
        act = self.head(out.astype(self.dtype)).astype(jnp.float32)
        return act, new_hidden
