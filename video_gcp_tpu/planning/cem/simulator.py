"""GCP model as a CEM rollout engine.

Reference: gcp/planning/cem/cem_simulator.py:7-107. Repeats the current state
and goal over the sample batch, injects latent samples z, runs the model in
prior ('val') mode with predicted length, and returns per-sample numpy
rollouts: predictions (flattened frames [+ latents]), inferred actions,
regressed states, latents. The model call is ONE jitted batched forward (the
reference splits batches host-side via max_rollout_bs; device batching makes
the split unnecessary below memory limits but is kept for parity).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict


class GCPSimulator:
    """State-space simulator (flat vector observations).

    :param mesh: optional `jax.sharding.Mesh` with a 'data' axis. When given,
        CEM candidates are SPMD-sharded over the mesh for the rollout — the
        TPU-native analogue of the reference's process-level planning
        parallelism (ControlManager --nworkers / benchmark splits,
        gcp/infra/run.py): instead of splitting *tasks* across worker
        processes, one planning step splits its *candidates* across chips and
        XLA inserts the collectives. Params are replicated; the candidate
        batch is sharded on its leading axis, so scoring stays bitwise
        identical to the single-device path.
    """

    def __init__(self, model, params, append_latent: bool, mesh=None):
        self._model = model
        self._mesh = mesh
        if mesh is not None:
            from video_gcp_tpu.parallel.mesh import batch_sharding, replicated

            self._params = jax.device_put(params, replicated(mesh))
            self._data_sharding = batch_sharding(mesh)
            self._data_axis_size = mesh.shape["data"]
        else:
            # params arrive as host numpy from the checkpoint reader; pin them
            # on device ONCE — otherwise every jitted call re-uploads the full
            # tree (tens of MB through the remote-TPU tunnel, minutes/rollout)
            self._params = jax.device_put(params)
            self._data_sharding = None
            self._data_axis_size = 1
        self._append_latent = append_latent
        self._rng = jax.random.PRNGKey(0)
        # shape bucket: candidate counts vary across CEM stages (per-layer
        # sampling rates, final-layer samples, the single final rollout) —
        # pad every batch to the largest count seen so ONE compiled graph
        # serves the whole planning session (retracing the L-level tree
        # forward costs minutes on a 1-core host)
        self._pad_bucket = 1

        def _run(params, inputs, rng):
            out = model.apply(
                params, inputs, "plan", "prior", True, rngs={"sample": rng}
            )
            # return ONLY the planner-facing outputs: XLA dead-code-eliminates
            # the untouched tree internals, and device_get moves megabytes,
            # not the full output tree, through the (slow-fetch) tunnel
            keep = AttrDict(
                end_ind=out.end_ind,
                timeline_images=out.timeline_images,
                timeline_latents=out.timeline_latents,
            )
            if "actions" in out:
                keep.actions = out.actions
            if "regressed_state" in out:
                keep.regressed_state = out.regressed_state
            return keep

        self._run = jax.jit(_run)

    def _prep_inputs(self, state, goal_state, samples, rollout_len):
        b = samples.shape[0]
        return AttrDict(
            I_0=jnp.asarray(np.repeat(state, b, 0), jnp.float32),
            I_g=jnp.asarray(np.repeat(goal_state, b, 0), jnp.float32),
            start_ind=jnp.zeros((b,), jnp.int32),
            end_ind=jnp.full((b,), rollout_len - 1, dtype=jnp.int32),
            z=jnp.asarray(samples, jnp.float32),
        )

    def rollout(self, state, goal_state, samples, rollout_len) -> AttrDict:
        from video_gcp_tpu.planning.infra.sim.benchmarks import heartbeat

        heartbeat()
        b = samples.shape[0]
        n = self._data_axis_size
        # bucket rounds up to a data-axis multiple so the sharded batch
        # divides the mesh evenly (padding rows are discarded below anyway)
        self._pad_bucket = -(-max(self._pad_bucket, b) // n) * n
        if b < self._pad_bucket:
            samples = np.concatenate(
                [samples, np.repeat(samples[-1:], self._pad_bucket - b, 0)], 0)
        inputs = self._prep_inputs(state, goal_state, samples, rollout_len)
        if self._data_sharding is not None:
            inputs = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._data_sharding), inputs)
        self._rng, rng = jax.random.split(self._rng)
        out = jax.device_get(self._run(self._params, inputs, rng))

        end_ind = np.maximum(np.asarray(out.end_ind), 1)

        def cap(x, i):
            return np.asarray(x[i, : end_ind[i] + 1])

        predictions, actions, states, latents = [], [], [], []
        for i in range(b):
            frames = cap(out.timeline_images, i).reshape(end_ind[i] + 1, -1)
            lat = cap(out.timeline_latents, i)
            if self._append_latent:
                frames = np.concatenate([frames, lat], axis=-1)
            predictions.append(frames)
            latents.append(lat)
            if "actions" in out:
                actions.append(np.asarray(out.actions[i, : end_ind[i] + 1]))
            if "regressed_state" in out:
                states.append(cap(out.regressed_state, i))
        return AttrDict(
            predictions=predictions, actions=actions, states=states,
            latents=latents,
        )


class GCPImageSimulator(GCPSimulator):
    """Image observations: converts env images ([0,255] or [0,1] HWC) to the
    planner's [-1, 1] range (cem_simulator.py:85-96)."""

    def _prep_inputs(self, state, goal_state, samples, rollout_len):
        def env2planner(img):
            img = np.asarray(img, np.float32)
            if img.max() > 1.0:
                img = img / 255.0
            if img.ndim == 5:
                img = img[0]
            return img * 2.0 - 1.0

        b = samples.shape[0]
        return AttrDict(
            I_0=jnp.asarray(np.repeat(env2planner(state), b, 0), jnp.float32),
            I_g=jnp.asarray(np.repeat(env2planner(goal_state), b, 0), jnp.float32),
            start_ind=jnp.zeros((b,), jnp.int32),
            end_ind=jnp.full((b,), rollout_len - 1, dtype=jnp.int32),
            z=jnp.asarray(samples, jnp.float32),
        )


class ActCondGCPImageSimulator(GCPImageSimulator):
    """Action-conditioned variant: samples are action sequences, not latents
    (cem_simulator.py:100-107)."""

    def _prep_inputs(self, state, goal_state, samples, rollout_len):
        inputs = super()._prep_inputs(state, goal_state, samples, rollout_len)
        inputs.actions = inputs.pop("z")
        inputs.pad_mask = jnp.ones(inputs.actions.shape[:2], jnp.float32)
        return inputs
