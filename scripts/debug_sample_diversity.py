"""Diagnose near-zero top-of-100 sample diversity at the 25-room config.

Loads the flagship checkpoint (latest epoch), runs the model in prior mode on
one real val batch with two different `sample` rngs, and reports (a) the
learned prior's per-level mean sigma, (b) the per-level std of the sampled z
across the two draws, and (c) the pixel-space difference of the decoded trees.
Distinguishes "eval RNG bug" (z identical) from "prior collapse" (z differs,
sigma tiny, images identical) — see VERDICT r4 weak #3.

Run on CPU: JAX_PLATFORMS=cpu python scripts/debug_sample_diversity.py [conf]
"""
import os
import sys

os.environ.setdefault("GCP_DATA_DIR", "/root/data")
os.environ.setdefault("GCP_EXP_DIR", "/root/exp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# in-process override, not the env var: the axon sitecustomize force-sets
# jax_platforms='axon,cpu' at interpreter start (see tests/conftest.py),
# which would put this diagnostic on the (shared, single) TPU chip and
# contend with whatever experiment is running there
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from video_gcp_tpu.training.trainer import ModelTrainer, parse_args


def main():
    conf = sys.argv[1] if len(sys.argv) > 1 else \
        "experiments/prediction/25room/gcp_tree"
    t = ModelTrainer(parse_args(["--path", conf, "--val_data_size", "16"]))
    batch = next(iter(t.val_loader))
    params = t.state.params

    from video_gcp_tpu.core.metrics import to_float_images

    batch.traj_seq = to_float_images(batch.traj_seq)

    @jax.jit
    def fwd(rng):
        return t.model.apply(params, batch, "test", "prior", False,
                             rngs={"sample": rng})

    out_a = fwd(jax.random.PRNGKey(1))
    out_b = fwd(jax.random.PRNGKey(2))

    depth = t.hp["hierarchy_levels"]
    sizes = [2 ** d for d in range(depth)]
    off = np.cumsum([0] + sizes)
    sig = np.asarray(jnp.exp(out_a.tree.p_z.log_sigma))
    mu = np.asarray(out_a.tree.p_z.mu)
    z_a = np.asarray(out_a.tree.z)
    z_b = np.asarray(out_b.tree.z)
    img_a = np.asarray(out_a.tree.images)
    img_b = np.asarray(out_b.tree.images)

    print(f"{'lvl':>3} {'p_sigma_mean':>13} {'p_mu_absmean':>13} "
          f"{'|z_a-z_b|':>11} {'|img_a-img_b|':>14}")
    for d in range(depth):
        s = slice(off[d], off[d + 1])
        print(f"{d:>3} {sig[:, s].mean():13.6f} "
              f"{np.abs(mu[:, s]).mean():13.6f} "
              f"{np.abs(z_a[:, s] - z_b[:, s]).mean():11.6f} "
              f"{np.abs(img_a[:, s] - img_b[:, s]).mean():14.6f}")
    print(f"\nwhole-tree image mean abs diff: "
          f"{np.abs(img_a - img_b).mean():.8f}")
    print(f"whole-tree z mean abs diff:    "
          f"{np.abs(z_a - z_b).mean():.8f}")
    # pixel-copy / skip path sanity: do decoded images react to a z shift?
    if np.abs(z_a - z_b).mean() < 1e-6:
        print("DIAGNOSIS: z identical across rngs -> RNG plumbing bug")
    elif np.abs(img_a - img_b).mean() < 1e-5:
        if sig.mean() < 1e-3:
            print("DIAGNOSIS: prior sigma collapsed -> z's differ only "
                  "microscopically; images deterministic (training-state "
                  "issue, not an eval bug)")
        else:
            print("DIAGNOSIS: z differs with healthy sigma but images "
                  "identical -> decoder ignores z (posterior/decoder collapse)")
    else:
        print("DIAGNOSIS: samples differ; diversity is just low-variance")


if __name__ == "__main__":
    main()
