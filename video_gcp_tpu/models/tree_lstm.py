"""TreeLSTM subgoal predictors: fuse two parents' hidden states, step an LSTM.

Rebuilds gcp/prediction/models/tree/tree_lstm.py:11-74 — the hidden-state
fusion variants 'sum' / 'linear' / 'split_linear' and the zero/MLP LSTM state
initializers — on packed-state LSTM stacks (nets.LSTMStack /
nets.ConvLSTMStack), so a whole tree level of 2^d nodes is one batched fusion
+ one batched LSTM step. Under hp.use_conv_lstm the packed chunks are latent
grids and the linear fusions become 3x3 convs (tree_lstm.py:36-40).
"""
from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from video_gcp_tpu.models.nets import (
    CONV_LSTM_SPATIAL,
    MLP,
    lstm_state_size,
    make_lstm_stack,
)

Array = jnp.ndarray


class TreeLSTMPredictor(nn.Module):
    """Subgoal predictor p(e_sg | h_l, h_r, e_l, e_r, z, [e_0, e_g]).

    fusion: 'sum' adds the parents' packed states
    (SumTreeHiddenStatePredictorModel), 'linear' projects the concatenation
    (LinTree...), 'split_linear' projects each (c|h, layer) chunk with its own
    matrix — or its own 3x3 conv under use_conv_lstm — (SplitLinTree..., the
    published config choice, base_tree.py).
    """

    hp: dict
    fusion: str  # 'sum' | 'linear' | 'split_linear'
    dtype: Any = jnp.float32

    def _fuse_chunks(self, hidden_l: Array, hidden_r: Array,
                     per_chunk: bool) -> Array:
        """Project parent-state chunk pairs; conv on grids, dense on vectors."""
        hp = self.hp
        n_chunks = hp["n_lstm_layers"] * 2
        conv = hp.get("use_conv_lstm", False)
        chunk_pairs = list(zip(jnp.split(hidden_l, n_chunks, axis=-1),
                               jnp.split(hidden_r, n_chunks, axis=-1)))
        if not per_chunk:  # 'linear': one projection over everything
            chunk_pairs, n_chunks = [(hidden_l, hidden_r)], 1

        outs = []
        for i, (cl, cr) in enumerate(chunk_pairs):
            x = jnp.concatenate([cl, cr], -1).astype(self.dtype)
            width = cl.shape[-1]
            if conv:
                s = CONV_LSTM_SPATIAL
                ch = width // (s * s)
                lead = x.shape[:-1]
                grid = x.reshape((math.prod(lead) if lead else 1, s, s,
                                  2 * ch))
                y = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"proj_{i}")(grid)
                outs.append(y.reshape(lead + (width,)))
            else:
                outs.append(nn.Dense(width, dtype=self.dtype,
                                     name=f"proj_{i}")(x))
        return jnp.concatenate(outs, -1).astype(jnp.float32)

    @nn.compact
    def __call__(self, hidden_l: Array, hidden_r: Array, *inputs: Array
                 ) -> Tuple[Array, Array]:
        hp = self.hp
        if self.fusion == "sum":
            fused = hidden_l + hidden_r
        elif self.fusion == "linear":
            fused = self._fuse_chunks(hidden_l, hidden_r, per_chunk=False)
        elif self.fusion == "split_linear":
            fused = self._fuse_chunks(hidden_l, hidden_r, per_chunk=True)
        else:
            raise ValueError(f"unknown tree_lstm fusion {self.fusion!r}")

        x = jnp.concatenate(inputs, axis=-1)
        new_state, out = make_lstm_stack(hp, dtype=self.dtype)(fused, x)
        e_sg = jnp.tanh(
            nn.Dense(hp["nz_enc"], dtype=self.dtype)(out.astype(self.dtype)))
        return new_state, e_sg.astype(jnp.float32)


class LSTMInitializer(nn.Module):
    """Initial hidden states for the virtual root parents (start/goal nodes).

    kind 'zero' -> zeros (ZeroLSTMCellInitializer); 'mlp' -> two MLP heads
    mapping (e_l, e_r, z) of the first subgoal call to left/right parent states
    (MLPLSTMCellInitializer; input dim 2*nz_enc + nz_vae, tree_lstm.py:72).
    """

    hp: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, e_l: Array, e_r: Array, z: Array) -> Tuple[Array, Array]:
        hp = self.hp
        state_size = lstm_state_size(hp)
        if hp.get("lstm_init", "zero") == "zero":
            shape = e_l.shape[:-1] + (state_size,)
            return jnp.zeros(shape), jnp.zeros(shape)
        mid = hp.get("init_mlp_mid_sz", 32)
        layers = hp.get("init_mlp_layers", 3)
        h_l = MLP(state_size, mid, layers, self.dtype, final_activation=None)(e_l, e_r, z)
        h_r = MLP(state_size, mid, layers, self.dtype, final_activation=None)(e_l, e_r, z)
        return h_l, h_r
