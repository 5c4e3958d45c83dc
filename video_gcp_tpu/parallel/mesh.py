"""Device mesh + sharding rules.

The reference's only parallelism is single-node torch DataParallel with a
custom tree-object gather (SURVEY.md §2.14). TPU-native replacement: a
jax.sharding.Mesh with a 1-D 'data' axis (growable to ('data', 'model') for
tensor-parallel decoders); the batch is sharded over 'data', parameters are
replicated, and XLA inserts the gradient psum — no hand-written collectives,
no object gathers (the tree is a dense [B, 2^L-1, ...] array, so DataParallel's
`SubgoalTreeLayer.reduce` machinery has no equivalent here by construction).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the same
code paths then span hosts over DCN (data axis) with ICI inside each slice.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over the first n_devices devices.

    :param shape: per-axis sizes (must multiply to the device count); when
        omitted, all devices go on the first axis. E.g. a dp x fsdp layout:
        `make_mesh(8, ("data", "model"), (2, 4))`.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, (shape, n)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, tree, axis: str = "model",
                    min_shard_size: int = 2 ** 15):
    """FSDP-style weight sharding specs for an arbitrary param/state pytree.

    Each large array gets its largest `axis`-divisible dimension sharded
    over the mesh's `axis`; small or indivisible arrays are replicated.
    Under GSPMD this is the ZeRO-3 pattern: parameters and optimizer
    moments live sharded in HBM and XLA inserts the all-gathers at use
    sites and reduce-scatters on the gradients — no hand-written
    collectives (the reference's DataParallel has no analogue; SURVEY
    §2.14). Combine with the 'data' axis for dp x fsdp 2-D layouts.
    """
    size = mesh.shape[axis] if axis in mesh.axis_names else 1

    def rule(x):
        if size > 1 and hasattr(x, "ndim") and x.ndim >= 1 \
                and x.size >= min_shard_size:
            for d in sorted(range(x.ndim), key=lambda d: -x.shape[d]):
                if x.shape[d] % size == 0:
                    spec = [None] * x.ndim
                    spec[d] = axis
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)
