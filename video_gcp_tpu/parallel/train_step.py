"""Jitted, sharded train/val steps.

Replaces the reference train loop's per-batch work — forward, loss, backward,
clipped optimizer step, schedule updates (gcp/prediction/train.py:139-192,
gcp_builder.py:174-186) — with ONE compiled XLA program: under jit with a
data-sharded batch and replicated params, XLA inserts the gradient psum over
the mesh (the DataParallel equivalent) and fuses the optimizer update.

NaN handling is TPU-friendly: instead of the reference's NaN-grad hook + pdb
(base_trainer.py:24-66), the step returns `grads_finite`; non-finite updates
are skipped on device (the optimizer update is masked), and the host can dump
debug state when the flag trips.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from video_gcp_tpu.core.attrdict import AttrDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)


def make_optimizer(optim: str = "radam", lr: float = 1e-3,
                   gradient_clip: Optional[float] = None,
                   momentum: float = 0.9, beta: float = 0.9) -> optax.GradientTransformation:
    """adam/radam/rmsprop/sgd, each wrapped with gradient clipping
    (gcp_builder.py:174-186; RAdam is the reference default)."""
    if optim == "adam":
        tx = optax.adam(lr, b1=beta)
    elif optim == "radam":
        tx = optax.radam(lr, b1=beta)
    elif optim == "rmsprop":
        tx = optax.rmsprop(lr, momentum=momentum)
    elif optim == "sgd":
        tx = optax.sgd(lr, momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {optim!r}")
    if gradient_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip), tx)
    return tx


def make_train_step(model, mesh=None, state=None) -> Callable:
    """Build the jitted train step; donates the state buffer.

    :param state: pass the concrete (or abstract) TrainState when the mesh
        has a 'model' axis of size > 1 — its pytree drives the FSDP param
        shardings; with a pure data mesh it is unused.
    """

    def train_step(state: TrainState, batch: AttrDict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = model.apply(params, batch, "train", "posterior",
                              step=state.step, rngs={"sample": rng})
            return out.losses.total.value, out.losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        # skip non-finite updates on device (NaN hook TPU-equivalent)
        gflat = jax.tree_util.tree_leaves(grads)
        grads_finite = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(g)) for g in gflat])
        )
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(grads_finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics = AttrDict(
            {k: v.value for k, v in losses.items()},
            grads_finite=grads_finite,
            grad_norm=optax.global_norm(grads),
        )
        # layerwise tree-loss breakdowns (tree_module.py:159-169)
        for k in ("dense_img_rec", "kl"):
            term = losses.get(k)
            if term is not None and term.breakdown is not None:
                n = term.breakdown.shape[-1]
                if n > 1 and (n & (n + 1)) == 0:  # node axis of a full tree
                    from video_gcp_tpu.ops.tree_index import per_level_means

                    metrics[k + "_layerwise"] = per_level_means(term.breakdown)
        return new_state, metrics

    if mesh is not None:
        from video_gcp_tpu.parallel.mesh import (
            batch_sharding, param_shardings, replicated,
        )

        rep = replicated(mesh)
        data = batch_sharding(mesh)
        state_shd = rep
        if state is not None and mesh.shape.get("model", 1) > 1:
            # dp x fsdp: parameters + optimizer moments sharded over the
            # 'model' axis (see mesh.param_shardings), batch over 'data'
            state_shd = param_shardings(mesh, state)
        train_step = jax.jit(
            train_step,
            in_shardings=(state_shd, data, rep),
            out_shardings=(state_shd, rep),
            donate_argnums=(0,),
        )
    else:
        train_step = jax.jit(train_step, donate_argnums=(0,))
    return train_step


def make_val_step(model) -> Callable:
    """Validation NLL with the train-mode posterior (train.py:211-215)."""

    def val_step(state: TrainState, batch: AttrDict, rng: jax.Array):
        out = model.apply(state.params, batch, "train", "posterior",
                          step=state.step, rngs={"sample": rng})
        return AttrDict({k: v.value for k, v in out.losses.items()})

    return jax.jit(val_step)
