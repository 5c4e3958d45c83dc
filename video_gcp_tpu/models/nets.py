"""Network building blocks (flax) — the blox.torch layer/subnetwork surface.

Reimplements, TPU-first, the blox components the reference models import
(SURVEY.md §2.9): conv encoder/decoder pyramids with skip connections
(`blox.torch.encoder_decoder.Encoder/DecoderModule`), MLP predictors
(`Predictor`/`BaseProcessingNet`), temporal sequence encoders
(`ConvSeqEncodingModule`, `RecurrentSeqEncodingModule`,
`BidirectionalSeqEncodingModule`), multi-layer LSTM stacks with packed states
(`BaseProcessingLSTM`, `HiddenStatePredictorModel`), Gaussian variational heads
with learned/fixed priors (`setup_variational_inference`), and masked
multi-head attention. The blox submodule is empty in the reference checkout, so
internals here are original designs honoring the same hyperparameters.

Conventions: images are NHWC (channel-last = TPU lane dimension); compute dtype
is configurable (bfloat16 on TPU) with float32 parameters.
"""
from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_gcp_tpu.core.distributions import Gaussian, unit_gaussian
from video_gcp_tpu.ops.fused_gn import fusable, fused_group_norm_lrelu

Array = jnp.ndarray


def _fused_gn_enabled() -> bool:
    """Opt-in switch for the single-pass Pallas GroupNorm+LeakyReLU
    (ops/fused_gn.py). Off by default so numbers produced by in-flight
    pipelines stay attributable to the stock XLA lowering."""
    return os.environ.get("GCP_FUSED_GN", "0") == "1"


class GroupNorm(nn.GroupNorm):
    """GroupNorm with a fused LeakyReLU epilogue.

    Deliberately named `GroupNorm` so flax auto-naming produces the same
    `GroupNorm_k` checkpoint keys (params `scale`/`bias`) as the stock module
    this replaces — checkpoints trained either way load unchanged. When the
    fused path is enabled (GCP_FUSED_GN=1) and the shape is eligible, the
    norm+activation runs as one VMEM-resident Pallas pass; otherwise it is the
    stock flax math followed by leaky_relu."""

    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x):  # noqa: D102 — see class docstring
        if _fused_gn_enabled() and fusable(x.shape, self.num_groups):
            ch = x.shape[-1]
            scale = self.param("scale", self.scale_init, (ch,),
                               self.param_dtype)
            bias = self.param("bias", self.bias_init, (ch,), self.param_dtype)
            return fused_group_norm_lrelu(
                x.astype(self.dtype or x.dtype), scale, bias, self.num_groups,
                eps=self.epsilon, slope=self.negative_slope)
        return nn.leaky_relu(nn.GroupNorm.__call__(self, x),
                             self.negative_slope)


def _norm_act(hp, dtype):
    """Per-channel-count factory for the conv blocks' norm+LeakyReLU pair."""
    if hp.get("normalization", "group") == "group":

        def make(ch):
            groups = 8
            while ch % groups != 0:
                groups //= 2
            return GroupNorm(num_groups=groups, dtype=dtype)

        return make
    return lambda ch: (lambda x: nn.leaky_relu(x, 0.2))  # 'none'


class MLP(nn.Module):
    """n_layers hidden layers of mid_size + linear output head
    (blox BaseProcessingNet / Predictor)."""

    out_size: int
    mid_size: int
    n_layers: int = 3
    dtype: Any = jnp.float32
    final_activation: Optional[str] = None

    @nn.compact
    def __call__(self, *inputs: Array) -> Array:
        x = jnp.concatenate([i.astype(self.dtype) for i in inputs], axis=-1)
        for _ in range(self.n_layers):
            x = nn.Dense(self.mid_size, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(self.out_size, dtype=self.dtype)(x)
        if self.final_activation == "tanh":
            x = jnp.tanh(x)
        return x.astype(jnp.float32)


class ConvEncoder(nn.Module):
    """Stride-2 conv pyramid to a flat latent + per-resolution skips
    (blox Encoder; built at base_gcp.py:78).

    img_sz 2^k -> k stride-2 convs (channels ngf * 2^i, capped at 256),
    then a dense head to nz_enc. Skips are the pre-downsample activations,
    consumed by ConvDecoder.
    """

    hp: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: Array) -> Tuple[Array, list]:
        hp = self.hp
        n_levels = hp.get("n_conv_layers") or int(math.log2(hp["img_sz"]))
        x = img.astype(self.dtype)
        skips = []
        norm_act = _norm_act(hp, self.dtype)
        for i in range(n_levels):
            ch = min(hp["ngf"] * 2 ** i, 256)
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype)(x)
            x = norm_act(ch)(x)
            skips.append(x)
        x = x.reshape(x.shape[:-3] + (-1,))  # [B, ch] at 1x1 spatial
        e = nn.Dense(hp["nz_enc"], dtype=self.dtype)(x)
        return e.astype(jnp.float32), skips


class ConvDecoder(nn.Module):
    """Transposed-conv pyramid from a flat latent back to an image, with skip
    connections from the start-image encoder activations
    (blox DecoderModule; base_gcp.py:79, skips from base_gcp.py:190).

    Skips enter every `skips_stride`-th level when use_skips is set. The
    decoder also owns a learned global log_sigma used by the Gaussian
    reconstruction NLL (decoder.log_sigma, adaptive.py:133).
    """

    hp: dict
    dtype: Any = jnp.float32
    out_channels: Optional[int] = None  # overrides input_nc (e.g. DLM params)
    tanh_out: bool = True

    @nn.compact
    def __call__(self, e: Array, skips: Optional[list] = None) -> Array:
        hp = self.hp
        n_levels = hp.get("n_conv_layers") or int(math.log2(hp["img_sz"]))
        ch0 = min(hp["ngf"] * 2 ** (n_levels - 1), 256)
        s0 = hp["img_sz"] // 2 ** n_levels  # 1 unless n_conv_layers is set
        x = nn.Dense(ch0 * s0 * s0, dtype=self.dtype)(e.astype(self.dtype))
        x = x.reshape(x.shape[:-1] + (s0, s0, ch0))
        norm_act = _norm_act(hp, self.dtype)
        for i in reversed(range(n_levels)):
            if (
                hp.get("use_skips", True)
                and skips is not None
                and i % hp.get("skips_stride", 2) == 0
            ):
                skip = skips[i].astype(self.dtype)
                if skip.shape[0] != x.shape[0]:
                    # broadcast per-example skips over folded node/time axis
                    mult = x.shape[0] // skip.shape[0]
                    skip = jnp.repeat(skip, mult, axis=0)
                x = jnp.concatenate([x, skip], axis=-1)
            ch = min(hp["ngf"] * 2 ** max(i - 1, 0), 256) if i > 0 else hp["ngf"]
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype)(x)
            x = norm_act(ch)(x)
        out_ch = self.out_channels or hp["input_nc"]
        x = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=self.dtype)(x)
        if self.tanh_out:
            x = jnp.tanh(x)
        return x.astype(jnp.float32)

    def decoder_log_sigma(self):
        pass  # log_sigma lives in GaussianLogSigma at the model level


class GaussianLogSigma(nn.Module):
    """Learned global decoder log-sigma (learn_beta/initial_sigma,
    hyperparameters.py:66-67)."""

    hp: dict

    @nn.compact
    def __call__(self) -> Array:
        init = math.log(self.hp.get("initial_sigma", 1.0))
        if self.hp.get("learn_beta", True):
            return self.param("log_sigma", lambda k: jnp.full((), init))
        return jnp.full((), init)


class GaussianHead(nn.Module):
    """MLP emitting a diagonal Gaussian (q networks / learned priors,
    blox setup_variational_inference; tree_module.py:31)."""

    nz: int
    mid_size: int
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, *inputs: Array) -> Gaussian:
        if self.nz == 0:
            # zero-width latent (vmpc: nz_vae=0, deterministic inference)
            shape = inputs[0].shape[:-1] + (0,)
            return unit_gaussian(shape)
        out = MLP(2 * self.nz, self.mid_size, self.n_layers, self.dtype)(*inputs)
        return Gaussian.from_concat(out)


class FixedPriorHead(nn.Module):
    """Unit Gaussian prior (blox FixedPrior)."""

    nz: int

    @nn.compact
    def __call__(self, ref: Array, *unused) -> Gaussian:
        shape = ref.shape[:-1] + (self.nz,)
        return unit_gaussian(shape)


# ---------------------------------------------------------------------------
# LSTM stacks with packed state
# ---------------------------------------------------------------------------


class LSTMStack(nn.Module):
    """Multi-layer LSTM advancing one step; state packed as a single array
    [..., n_layers * 2 * size] ([c; h] per layer) so tree-structured models can
    interleave/fuse states as plain tensors (tree_lstm.py fusion ops)."""

    size: int
    n_layers: int
    dtype: Any = jnp.float32

    def pack(self, states) -> Array:
        return jnp.concatenate([jnp.concatenate([c, h], -1) for (c, h) in states], -1)

    def unpack(self, packed: Array):
        chunks = jnp.split(packed, self.n_layers, axis=-1)
        return [tuple(jnp.split(ch, 2, axis=-1)) for ch in chunks]

    @property
    def state_size(self) -> int:
        return self.n_layers * 2 * self.size

    def top_h(self, packed: Array) -> Array:
        """Top layer's h as a [..., size] vector (read-only state view)."""
        return packed[..., -self.size:]

    @nn.compact
    def __call__(self, packed_state: Array, x: Array) -> Tuple[Array, Array]:
        states = self.unpack(packed_state.astype(self.dtype))
        x = x.astype(self.dtype)
        new_states = []
        for i in range(self.n_layers):
            cell = nn.OptimizedLSTMCell(self.size, dtype=self.dtype)
            new_state, x = cell(tuple(states[i]), x)
            new_states.append(new_state)
        return self.pack(new_states).astype(jnp.float32), x.astype(jnp.float32)


CONV_LSTM_SPATIAL = 4  # latent grid side for the conv-LSTM variant


class ConvLSTMStack(nn.Module):
    """Multi-layer ConvLSTM advancing one step over a small latent grid
    (hp.use_conv_lstm, ref hyperparameters.py:73-75 + tree_lstm.py:36; the
    reference's conv cell internals live in the absent blox submodule, so the
    grid design is original).

    Packed-state contract matches LSTMStack — a flat
    [..., n_layers * 2 * spatial^2 * size] array laid out
    [layer, (c|h), y, x, channel] — so tree-state fusion, initializers, and
    scan carries work on either stack unchanged. Vector step inputs enter via
    a Dense stem reshaped onto the grid; the step output is the spatially
    mean-pooled top-layer h, a [..., size] vector like LSTMStack's."""

    size: int
    n_layers: int
    spatial: int = CONV_LSTM_SPATIAL
    dtype: Any = jnp.float32

    @property
    def state_size(self) -> int:
        return self.n_layers * 2 * self.spatial ** 2 * self.size

    def top_h(self, packed: Array) -> Array:
        s, c = self.spatial, self.size
        h = packed[..., -s * s * c:]
        return h.reshape(h.shape[:-1] + (s, s, c)).mean(axis=(-3, -2))

    @nn.compact
    def __call__(self, packed_state: Array, x: Array) -> Tuple[Array, Array]:
        s, c = self.spatial, self.size
        lead = packed_state.shape[:-1]
        flat_b = math.prod(lead) if lead else 1
        maps = packed_state.astype(self.dtype).reshape(
            (flat_b, self.n_layers, 2, s, s, c))
        x = nn.Dense(s * s * c, dtype=self.dtype)(x.astype(self.dtype))
        x = x.reshape((flat_b, s, s, c))
        new_layers = []
        for i in range(self.n_layers):
            cell = nn.ConvLSTMCell(features=c, kernel_size=(3, 3),
                                   dtype=self.dtype)
            (nc, nh), x = cell((maps[:, i, 0], maps[:, i, 1]), x)
            new_layers.append(jnp.stack([nc, nh], axis=1))
        packed = jnp.stack(new_layers, axis=1).reshape(
            lead + (self.state_size,))
        out = x.mean(axis=(-3, -2)).reshape(lead + (c,))
        return packed.astype(jnp.float32), out.astype(jnp.float32)


def make_lstm_stack(hp, dtype=jnp.float32):
    """The recurrent core the hparams ask for: ConvLSTMStack when
    hp.use_conv_lstm, else LSTMStack. Both share the packed-state contract."""
    if hp.get("use_conv_lstm", False):
        return ConvLSTMStack(hp["nz_mid_lstm"], hp["n_lstm_layers"],
                             dtype=dtype)
    return LSTMStack(hp["nz_mid_lstm"], hp["n_lstm_layers"], dtype=dtype)


def lstm_state_size(hp) -> int:
    """Packed recurrent-state width for the configured stack type."""
    size = hp["n_lstm_layers"] * 2 * hp["nz_mid_lstm"]
    if hp.get("use_conv_lstm", False):
        size *= CONV_LSTM_SPATIAL ** 2
    return size


# ---------------------------------------------------------------------------
# temporal sequence encoders (hp.seq_enc)
# ---------------------------------------------------------------------------


class ConvSeqEncoder(nn.Module):
    """1-D temporal conv over per-frame latents (blox ConvSeqEncodingModule;
    hp.conv_inf_enc_kernel_size/layers)."""

    hp: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq: Array) -> Array:
        x = seq.astype(self.dtype)  # [B, T, D]
        k = self.hp.get("conv_inf_enc_kernel_size", 3)
        for _ in range(self.hp.get("conv_inf_enc_layers", 1)):
            x = nn.Conv(self.hp["nz_enc"], (k,), padding="SAME", dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        return x.astype(jnp.float32)


class RecurrentSeqEncoder(nn.Module):
    """LSTM over time (blox RecurrentSeqEncodingModule); bidirectional variant
    concatenates a reversed pass (BidirectionalSeqEncodingModule)."""

    hp: dict
    bidirectional: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq: Array) -> Array:
        size = self.hp["nz_enc"]
        fwd = nn.RNN(nn.OptimizedLSTMCell(size, dtype=self.dtype))
        out = fwd(seq.astype(self.dtype))
        if self.bidirectional:
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(size, dtype=self.dtype),
                reverse=True,
                keep_order=True,
            )
            out_b = bwd(seq.astype(self.dtype))
            out = nn.Dense(size, dtype=self.dtype)(jnp.concatenate([out, out_b], -1))
        return out.astype(jnp.float32)


def build_seq_encoder(hp, dtype=jnp.float32):
    kind = hp.get("seq_enc", "none")
    if kind == "none":
        return None
    if kind == "conv":
        return ConvSeqEncoder(hp, dtype=dtype)
    if kind == "lstm":
        return RecurrentSeqEncoder(hp, dtype=dtype)
    if kind == "bi-lstm":
        return RecurrentSeqEncoder(hp, bidirectional=True, dtype=dtype)
    raise ValueError(f"unknown seq_enc {kind!r}")


# ---------------------------------------------------------------------------
# masked multi-head attention (attentive inference)
# ---------------------------------------------------------------------------


class MaskedMultiheadAttention(nn.Module):
    """One layer of time-masked multi-head attention (blox MultiheadAttention
    as used by AttentiveInference). Query is already projected to nz_attn_key.
    Returns the attended value [.., nz_enc] and attention weights."""

    hp: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: Array,  # [.., Dk]
        keys: Array,  # [.., T, Dk]
        values: Array,  # [.., T, Dv]
        start_ind: Array,  # [..]
        end_ind: Array,  # [..]
    ) -> Tuple[Array, Array]:
        hp = self.hp
        n_heads = hp.get("n_attention_heads", 1)
        d_key = hp.get("nz_attn_key", hp["nz_enc"])
        assert d_key % n_heads == 0
        d_head = d_key // n_heads
        t = keys.shape[-2]

        q = nn.Dense(d_key, dtype=self.dtype)(query.astype(self.dtype))
        k = nn.Dense(d_key, dtype=self.dtype)(keys.astype(self.dtype))
        v = nn.Dense(hp["nz_enc"], dtype=self.dtype)(values.astype(self.dtype))

        q = q.reshape(q.shape[:-1] + (n_heads, d_head))
        k = k.reshape(k.shape[:-2] + (t, n_heads, d_head))
        vh = v.reshape(v.shape[:-2] + (t, n_heads, hp["nz_enc"] // n_heads))

        logits = jnp.einsum("...hd,...thd->...ht", q, k) / jnp.sqrt(d_head)
        if hp.get("learn_attn_temp", True):
            log_temp = self.param(
                "log_attn_temp",
                lambda key: jnp.full((), jnp.log(hp.get("attention_temperature", 1.0))),
            )
            logits = logits / jnp.exp(log_temp)
        else:
            logits = logits / hp.get("attention_temperature", 1.0)

        t_idx = jnp.arange(t)
        mask = (t_idx >= start_ind[..., None]) & (t_idx <= end_ind[..., None])
        logits = jnp.where(mask[..., None, :], logits, -1e30)
        gamma = jax.nn.softmax(logits, axis=-1)  # [.., h, T]
        attended = jnp.einsum("...ht,...thd->...hd", gamma, vh)
        attended = attended.reshape(attended.shape[:-2] + (hp["nz_enc"],))
        return attended.astype(jnp.float32), jnp.mean(gamma, axis=-2).astype(
            jnp.float32
        )
