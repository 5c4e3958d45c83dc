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
import os
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


def _timed_scan(fn, params, inputs, key, n_iters):
    """Compile+warmup, then time one n_iters-scan dispatch; returns s/iter."""
    f = jax.jit(fn, static_argnames="n")
    jax.block_until_ready(f(params, inputs, key, n_iters))
    t0 = time.perf_counter()
    jax.block_until_ready(f(params, inputs, jax.random.fold_in(key, 1),
                            n_iters))
    return (time.perf_counter() - t0) / n_iters


def bench_cem_rollouts(n_candidates: int = 100, levels: int = 7) -> float:
    """CEM planning rollouts/sec (BASELINE.md tracked metric): batched
    plan-mode tree rollouts at control scale — L=7 (127 nodes), one rollout
    per CEM candidate, full conv decode, scan-amortized."""
    _, rollout_n, params, inputs = build(n_candidates, levels)
    n_iters = 10
    dt = _timed_scan(rollout_n, params, inputs, jax.random.PRNGKey(2), n_iters)
    return n_candidates / dt


def bench_train_step(batch_size: int = 16, levels: int = 7,
                     seq_len: int = 100, img_sz: int = 64) -> float:
    """Training frames/sec/chip at the published 9-room scale: full
    loss+grad+NaN-masked-update step (balanced matching), scan-amortized.

    Uses the fused GroupNorm path when `_try_enable_fused_gn`'s probe (which
    exercises forward AND backward — the Pallas bwd kernel, ops/fused_gn.py)
    passed on this backend; otherwise the stock XLA lowering."""
    import optax

    from video_gcp_tpu.core.attrdict import AttrDict
    from video_gcp_tpu.models.hyperparameters import default_hparams
    from video_gcp_tpu.models.tree import TreeModel
    from video_gcp_tpu.parallel.train_step import TrainState, make_train_step

    hp = default_hparams()
    hp.overwrite(dict(
        batch_size=batch_size, max_seq_len=seq_len, img_sz=img_sz,
        hierarchy_levels=levels, matching_type="balanced", seq_enc="conv",
        tree_lstm="split_linear", lstm_init="mlp",
        ngf=16, nz_mid_lstm=512, n_lstm_layers=3, nz_mid=128, nz_enc=128,
        nz_vae=256,
    ))
    model = TreeModel(hp=dict(hp), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    batch = AttrDict(
        traj_seq=jnp.asarray(
            rng.rand(batch_size, seq_len, img_sz, img_sz, 3).astype(np.float32)
            * 2 - 1),
        pad_mask=jnp.ones((batch_size, seq_len), jnp.float32),
        end_ind=jnp.full((batch_size,), seq_len - 1, jnp.int32),
        start_ind=jnp.zeros((batch_size,), jnp.int32),
    )
    batch.I_0, batch.I_g = batch.traj_seq[:, 0], batch.traj_seq[:, -1]
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "sample": key}, b, "train",
                             "posterior"))(batch)
    state = TrainState.create(params, optax.adam(2e-4))
    step_fn = make_train_step(model, mesh=None)

    def scan_steps(state, batch, key, n):
        def body(s, k):
            s, metrics = step_fn(s, batch, k)
            return s, metrics["total"]

        return jax.lax.scan(body, state, jax.random.split(key, n))[1].mean()

    f = jax.jit(scan_steps, static_argnames="n")
    n_iters = 5
    jax.block_until_ready(f(state, batch, key, n_iters))
    t0 = time.perf_counter()
    jax.block_until_ready(f(state, batch, jax.random.fold_in(key, 3), n_iters))
    dt = (time.perf_counter() - t0) / n_iters
    return batch_size * seq_len / dt


def _try_enable_fused_gn() -> bool:
    """Opt into the fused GroupNorm+LeakyReLU Pallas pass (ops/fused_gn.py)
    when a probe compiles and matches the stock path on this backend; any
    failure leaves the stock XLA lowering so the primary metric always lands.
    An explicit GCP_FUSED_GN in the environment wins either way."""
    if "GCP_FUSED_GN" in os.environ:
        return os.environ["GCP_FUSED_GN"] == "1"
    try:
        from video_gcp_tpu.ops.fused_gn import (
            fused_group_norm_lrelu,
            gn_lrelu_reference,
        )

        x = jnp.asarray(
            np.random.RandomState(0).randn(4, 8, 16, 32), jnp.bfloat16)
        sc = jnp.ones((32,))
        bi = jnp.zeros((32,))
        out = jax.block_until_ready(fused_group_norm_lrelu(x, sc, bi, 8))
        ref = gn_lrelu_reference(x, sc, bi, 8)
        ok = bool(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                  ref.astype(jnp.float32))) < 0.05)
        # the train-step metric also runs fused, so probe the Pallas
        # backward kernel before committing to it
        if ok:
            def _loss(f):
                def loss(xx, ss, bb):
                    return jnp.sum(f(xx, ss, bb).astype(jnp.float32) ** 2)
                return jax.grad(loss, argnums=(0, 1, 2))

            gf = _loss(lambda a, b, c: fused_group_norm_lrelu(a, b, c, 8))(
                x, sc, bi)
            gr = _loss(lambda a, b, c: gn_lrelu_reference(a, b, c, 8))(
                x, sc, bi)
            jax.block_until_ready(gf)
            ok = all(
                bool(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                     b.astype(jnp.float32))) <
                     0.05 * max(1.0, float(jnp.max(jnp.abs(
                         b.astype(jnp.float32))))))
                for a, b in zip(gf, gr))
    except Exception:
        ok = False
    os.environ["GCP_FUSED_GN"] = "1" if ok else "0"
    return ok


def _chip_peak_flops() -> float:
    """Peak dense bf16 FLOPs/s for the local chip (TPU generations; defaults
    to v5e's 197 TFLOPs/s when the device kind is unrecognized)."""
    kind = jax.devices()[0].device_kind.lower()
    for pat, peak in (("v6", 918e12), ("v5p", 459e12), ("v5", 197e12),
                      ("v4", 275e12), ("v3", 123e12)):
        if pat in kind:
            return peak
    return 197e12


def _rollout_flops(rollout, params, inputs, key):
    """XLA's own FLOP count for one jitted rollout dispatch (auditable vs a
    hand-derived analytic count; None if the backend doesn't report it)."""
    try:
        cost = jax.jit(rollout).lower(params, inputs, key).compile() \
            .cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def main():
    from video_gcp_tpu.core.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    fused_gn = _try_enable_fused_gn()
    batch_size = 32  # per chip (batch sweep: 32 saturates the v5e MXU)
    levels = 9  # 511 nodes -> >=500 predicted frames
    n_frames = 500

    rollout, rollout_n, params, inputs = build(batch_size, levels)
    key = jax.random.PRNGKey(1)

    n_iters = 20
    dt = _timed_scan(rollout_n, params, inputs, key, n_iters)
    frames_per_sec = batch_size * n_frames / dt

    # MFU: XLA-reported FLOPs per rollout dispatch x dispatches/s / chip peak
    flops = _rollout_flops(rollout, params, inputs, key)
    mfu = round(flops / dt / _chip_peak_flops(), 4) if flops else None

    # secondary tracked metrics (BASELINE.md:26-28); same one-line contract
    secondary = {}
    try:
        secondary["cem_rollouts_per_sec"] = round(bench_cem_rollouts(), 1)
    except Exception as e:  # never break the primary metric line
        secondary["error"] = f"{type(e).__name__}: {e}"[:200]
    # Train metric: measure BOTH lowerings and report the faster one
    # (VERDICT r4 weak #2: the correctness-only probe once auto-enabled a
    # path with no speed evidence). The quiet-chip A/B
    # (experiments/profiles/fused_gn_train_ab_clean.json: fused 1.57x) says
    # fused should win, but the driver bench now proves it per-session; both
    # HLOs sit in the persistent compile cache, so the second timing is one
    # extra ~2 s run, not a recompile.
    train = {}
    for label, flag in (("stock", "0"), ("fused", "1")):
        if label == "fused" and not fused_gn:
            continue  # probe failed on this backend: no fused path at all
        try:
            os.environ["GCP_FUSED_GN"] = flag
            train[label] = round(bench_train_step(), 1)
        except Exception as e:
            secondary[f"train_{label}_error"] = f"{type(e).__name__}: {e}"[:200]
    os.environ["GCP_FUSED_GN"] = "1" if fused_gn else "0"
    if train:
        best = max(train, key=train.get)
        secondary["train_frames_per_sec"] = train[best]
        secondary["train_fused_gn"] = best == "fused"
        secondary["train_both"] = train

    print(json.dumps({
        "metric": "predicted 64x64 frames/sec/chip (500-step tree rollout)",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec / 5000.0, 3),
        "mfu": mfu,
        "fused_gn": fused_gn,
        "secondary": secondary,
    }))


if __name__ == "__main__":
    main()
