"""A/B the fused GroupNorm pass (Pallas fwd + Pallas bwd) on the TRAIN step.

Runs bench.bench_train_step twice in one process — stock XLA lowering vs the
fused kernel (GCP_FUSED_GN toggled; the step retraces per call) — and writes
the comparison to experiments/profiles/fused_gn_train_ab.json. Also runs 10
real optimizer steps under each lowering from identical init/rng and compares
the loss trajectories, so the speedup is not coming from computing something
else.

Single-chip etiquette: run serialized with other TPU jobs.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def loss_trajectory(n_steps: int = 10):
    """n real optimizer steps on a fixed batch; returns the loss sequence."""
    import optax

    from video_gcp_tpu.core.attrdict import AttrDict
    from video_gcp_tpu.models.hyperparameters import default_hparams
    from video_gcp_tpu.models.tree import TreeModel
    from video_gcp_tpu.parallel.train_step import TrainState, make_train_step

    hp = default_hparams()
    hp.overwrite(dict(
        batch_size=8, max_seq_len=100, img_sz=64, hierarchy_levels=7,
        matching_type="balanced", seq_enc="conv", tree_lstm="split_linear",
        lstm_init="mlp", ngf=16, nz_mid_lstm=512, n_lstm_layers=3,
        nz_mid=128, nz_enc=128, nz_vae=256,
    ))
    model = TreeModel(hp=dict(hp), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    batch = AttrDict(
        traj_seq=jnp.asarray(
            rng.rand(8, 100, 64, 64, 3).astype(np.float32) * 2 - 1),
        pad_mask=jnp.ones((8, 100), jnp.float32),
        end_ind=jnp.full((8,), 99, jnp.int32),
        start_ind=jnp.zeros((8,), jnp.int32),
    )
    batch.I_0, batch.I_g = batch.traj_seq[:, 0], batch.traj_seq[:, -1]
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "sample": key}, b, "train",
                             "posterior"))(batch)
    state = TrainState.create(params, optax.adam(2e-4))
    step_fn = make_train_step(model, mesh=None)
    losses = []
    for i in range(n_steps):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["total"]))
    return losses


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        "experiments", "profiles", "fused_gn_train_ab.json")
    # bench.py only enables the persistent compile cache in its own main();
    # without it every half of the A/B cold-compiles the full train-step scan
    # through the tunnel (observed: >25 min of silence)
    from video_gcp_tpu.core.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    import bench

    t0 = time.time()
    os.environ["GCP_FUSED_GN"] = "0"
    print("[ab] stock bench...", flush=True)
    stock_fps = bench.bench_train_step()
    print(f"[ab] stock {stock_fps:.0f} f/s ({time.time()-t0:.0f}s); "
          "stock loss trajectory...", flush=True)
    stock_losses = loss_trajectory()
    os.environ["GCP_FUSED_GN"] = "1"
    print(f"[ab] fused bench... ({time.time()-t0:.0f}s)", flush=True)
    fused_fps = bench.bench_train_step()
    print(f"[ab] fused {fused_fps:.0f} f/s ({time.time()-t0:.0f}s); "
          "fused loss trajectory...", flush=True)
    fused_losses = loss_trajectory()
    max_rel = max(
        abs(a - b) / max(1e-6, abs(a))
        for a, b in zip(stock_losses, fused_losses))
    result = {
        "backend": jax.default_backend(),
        "stock_train_frames_per_sec": round(stock_fps, 1),
        "fused_train_frames_per_sec": round(fused_fps, 1),
        "speedup": round(fused_fps / stock_fps, 4),
        "loss_traj_max_rel_diff": round(max_rel, 6),
        "stock_losses": [round(v, 5) for v in stock_losses],
        "fused_losses": [round(v, 5) for v in fused_losses],
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
