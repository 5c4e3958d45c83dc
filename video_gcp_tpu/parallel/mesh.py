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
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D (or reshaped n-D) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # fill trailing axes with 1 unless divisible split requested
        shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
