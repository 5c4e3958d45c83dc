"""TreeLSTM subgoal predictors: fuse two parents' hidden states, step an LSTM.

Rebuilds gcp/prediction/models/tree/tree_lstm.py:11-74 — the hidden-state
fusion variants 'sum' / 'linear' / 'split_linear' and the zero/MLP LSTM state
initializers — on packed-state LSTM stacks (nets.LSTMStack), so a whole tree
level of 2^d nodes is one batched fusion + one batched LSTM step.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from video_gcp_tpu.models.nets import MLP, LSTMStack

Array = jnp.ndarray


class TreeLSTMPredictor(nn.Module):
    """Subgoal predictor p(e_sg | h_l, h_r, e_l, e_r, z, [e_0, e_g]).

    fusion: 'sum' adds the parents' packed states
    (SumTreeHiddenStatePredictorModel), 'linear' projects the concatenation
    (LinTree...), 'split_linear' projects each (c|h, layer) chunk with its own
    matrix (SplitLinTree..., the published config choice, base_tree.py).
    """

    hp: dict
    fusion: str  # 'sum' | 'linear' | 'split_linear'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_l: Array, hidden_r: Array, *inputs: Array
                 ) -> Tuple[Array, Array]:
        hp = self.hp
        n_layers = hp["n_lstm_layers"]
        size = hp["nz_mid_lstm"]
        state_size = n_layers * 2 * size

        if self.fusion == "sum":
            fused = hidden_l + hidden_r
        elif self.fusion == "linear":
            fused = nn.Dense(state_size, dtype=self.dtype)(
                jnp.concatenate([hidden_l, hidden_r], -1).astype(self.dtype)
            ).astype(jnp.float32)
        elif self.fusion == "split_linear":
            chunks_l = jnp.split(hidden_l, n_layers * 2, axis=-1)
            chunks_r = jnp.split(hidden_r, n_layers * 2, axis=-1)
            projected = [
                nn.Dense(size, dtype=self.dtype, name=f"proj_{i}")(
                    jnp.concatenate([cl, cr], -1).astype(self.dtype)
                ).astype(jnp.float32)
                for i, (cl, cr) in enumerate(zip(chunks_l, chunks_r))
            ]
            fused = jnp.concatenate(projected, -1)
        else:
            raise ValueError(f"unknown tree_lstm fusion {self.fusion!r}")

        x = jnp.concatenate(inputs, axis=-1)
        new_state, out = LSTMStack(size, n_layers, dtype=self.dtype)(fused, x)
        e_sg = jnp.tanh(nn.Dense(hp["nz_enc"], dtype=self.dtype)(out.astype(self.dtype)))
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
        state_size = hp["n_lstm_layers"] * 2 * hp["nz_mid_lstm"]
        if hp.get("lstm_init", "zero") == "zero":
            shape = e_l.shape[:-1] + (state_size,)
            return jnp.zeros(shape), jnp.zeros(shape)
        mid = hp.get("init_mlp_mid_sz", 32)
        layers = hp.get("init_mlp_layers", 3)
        h_l = MLP(state_size, mid, layers, self.dtype, final_activation=None)(e_l, e_r, z)
        h_r = MLP(state_size, mid, layers, self.dtype, final_activation=None)(e_l, e_r, z)
        return h_l, h_r
