"""Benchmark: predicted 64x64 frames/sec/chip on 500-step GCP-tree rollouts.

The north-star metric (BASELINE.json): goal-conditioned generation of a
500-frame 64x64 sequence via the hierarchical tree predictor (9 levels, 511
nodes), prior sampling, full conv decode of every node — the planner-relevant
inference path. Reported as one JSON line:
    {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}
vs_baseline is value / 5000 (the >=5k frames/s/chip target).

Runs on whatever jax.default_backend() provides (the real TPU chip under the
driver); bfloat16 compute, float32 params.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(batch_size: int, levels: int = 9, img_sz: int = 64):
    from video_gcp_tpu.core.attrdict import AttrDict
    from video_gcp_tpu.models.hyperparameters import default_hparams
    from video_gcp_tpu.models.tree import TreeModel

    max_seq_len = 2 ** levels - 1
    hp = default_hparams()
    hp.overwrite(dict(
        batch_size=batch_size, max_seq_len=max_seq_len, img_sz=img_sz,
        hierarchy_levels=levels, matching_type="balanced", seq_enc="conv",
        tree_lstm="split_linear", lstm_init="mlp",
        ngf=16, nz_mid_lstm=512, n_lstm_layers=3, nz_mid=128, nz_enc=128,
        nz_vae=256,
    ))
    model = TreeModel(hp=dict(hp), dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    img = lambda: jnp.asarray(
        rng.rand(batch_size, img_sz, img_sz, 3).astype(np.float32) * 2 - 1
    )
    inputs = AttrDict(
        I_0=img(), I_g=img(),
        end_ind=jnp.full((batch_size,), max_seq_len - 1, dtype=jnp.int32),
        start_ind=jnp.zeros((batch_size,), jnp.int32),
    )
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda i: model.init({"params": key, "sample": key}, i, "test", "prior")
    )(inputs)

    @jax.jit
    def rollout(params, inputs, key):
        out = model.apply(params, inputs, "test", "prior",
                          rngs={"sample": key})
        return out.tree.images

    def rollout_n(params, inputs, key, n):
        """n rollouts in ONE dispatch (lax.scan over rng keys) — measures
        sustained on-chip throughput independent of host/tunnel dispatch
        latency."""

        def step(carry, k):
            out = model.apply(params, inputs, "test", "prior",
                              rngs={"sample": k})
            # reduce to a scalar so the scan doesn't materialize n full outputs
            return carry + out.tree.images.mean(), None

        keys = jax.random.split(key, n)
        acc, _ = jax.lax.scan(step, jnp.zeros(()), keys)
        return acc

    return rollout, rollout_n, params, inputs


def main():
    batch_size = 32  # per chip (batch sweep: 32 saturates the v5e MXU)
    levels = 9  # 511 nodes -> >=500 predicted frames
    n_frames = 500

    rollout, rollout_n, params, inputs = build(batch_size, levels)
    key = jax.random.PRNGKey(1)

    n_iters = 20
    f = jax.jit(rollout_n, static_argnames="n")
    # compile + warmup
    jax.block_until_ready(f(params, inputs, key, n_iters))

    t0 = time.perf_counter()
    out = f(params, inputs, jax.random.fold_in(key, 1), n_iters)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    frames_per_sec = batch_size * n_frames / dt
    print(json.dumps({
        "metric": "predicted 64x64 frames/sec/chip (500-step tree rollout)",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
