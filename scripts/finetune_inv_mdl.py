"""Fine-tune ONLY the inverse-model head from a trained GCP checkpoint.

Control intervention A (round-4 failure analysis, PARITY.md): the inverse
model trains on consecutive-pair encodings (reference inverse_mdl.py:110-179)
and saturates at |a| ~ 0.13 for wide latent gaps — the regime closed-loop
execution hits when wall collisions stall the agent while the plan cursor
advances. Because `run_aux_models` trains the inv_mdl on stop-gradient GT
encodings (models/base.py:299-329), the head can be retrained with wide-gap
pairs (inv_mdl_params.temp_dist > 1) WITHOUT touching the predictor: this
script loads the baseline params, masks the optimizer to the `inv_mdl`
subtree (optax.multi_transform, everything else set_to_zero), and runs a few
epochs of the regular train step. The resulting checkpoint differs from the
baseline only in the inverse model, so control A/Bs isolate that variable.

Usage:
  python scripts/finetune_inv_mdl.py \
      --path experiments/prediction/9room/gcp_tree_widegap \
      --base /root/exp/prediction/9room/gcp_tree/weights/weights_ep74 \
      --epochs 10
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_gcp_tpu.core.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import optax

from video_gcp_tpu.parallel.train_step import (
    TrainState, make_optimizer, make_train_step,
)
from video_gcp_tpu.training import checkpoint as ckpt
from video_gcp_tpu.training.trainer import ModelTrainer, parse_args


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path", required=True,
                   help="conf dir whose model_config sets the new "
                        "inv_mdl_params (e.g. temp_dist)")
    p.add_argument("--base", required=True,
                   help="baseline checkpoint dir (weights_epN) to start from")
    p.add_argument("--epochs", type=int, default=10)
    args = p.parse_args()

    t = ModelTrainer(parse_args(["--path", args.path, "--resume", "none"]))

    base_params = ckpt.load_params(args.base)
    params = jax.tree_util.tree_map(
        lambda tpl, arr: jnp.asarray(arr, tpl.dtype),
        t.state.params, base_params)

    def label(path, _):
        return ("train" if any(
            getattr(k, "key", None) == "inv_mdl" for k in path) else "freeze")

    labels = jax.tree_util.tree_map_with_path(label, params)
    n_train = sum(
        leaf.size for leaf, lab in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(labels)) if lab == "train")
    assert n_train > 0, "no inv_mdl params found in the checkpoint"
    print(f"fine-tuning {n_train} inv_mdl params "
          f"(temp_dist={t.hp['inv_mdl_params'].get('temp_dist', 1)}); "
          f"all other params frozen")

    tx = optax.multi_transform(
        {"train": make_optimizer(t.conf["optimizer"], t.conf["lr"] or 1e-3,
                                 t.conf["gradient_clip"], t.conf["momentum"],
                                 t.conf["adam_beta"]),
         "freeze": optax.set_to_zero()},
        labels)
    t.state = TrainState.create(params, tx)
    t.train_step = make_train_step(t.model, t.mesh, state=t.state)

    for epoch in range(args.epochs):
        t.train_epoch(epoch)
        ckpt.save_checkpoint(t.exp_path, epoch, t.state)
        t.val(epoch)


if __name__ == "__main__":
    main()
