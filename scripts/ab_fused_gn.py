"""A/B the fused GroupNorm+LeakyReLU Pallas pass on the headline bench.

Runs the bench rollout twice in one process — stock XLA lowering vs the
fused kernel (GCP_FUSED_GN toggled; bench.build retraces per call) — and
writes the comparison to experiments/profiles/fused_gn_ab.json. Also checks
that identical rng keys give matching rollout images, so the speedup is not
coming from computing something else.

Single-chip etiquette: run serialized with other TPU jobs (queue stage 3b).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure():
    import bench

    rollout, rollout_n, params, inputs = bench.build(32, 9)
    key = jax.random.PRNGKey(1)
    dt = bench._timed_scan(rollout_n, params, inputs, key, 20)
    img = rollout(params, inputs, jax.random.PRNGKey(7))
    return 32 * 500 / dt, img


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        "experiments", "profiles", "fused_gn_ab.json")
    os.environ["GCP_FUSED_GN"] = "0"
    t0 = time.time()
    stock_fps, stock_img = measure()
    os.environ["GCP_FUSED_GN"] = "1"
    fused_fps, fused_img = measure()
    max_diff = float(jnp.max(jnp.abs(stock_img.astype(jnp.float32) -
                                     fused_img.astype(jnp.float32))))
    result = {
        "backend": jax.default_backend(),
        "stock_frames_per_sec": round(stock_fps, 1),
        "fused_frames_per_sec": round(fused_fps, 1),
        "speedup": round(fused_fps / stock_fps, 4),
        "rollout_image_max_diff": max_diff,
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
