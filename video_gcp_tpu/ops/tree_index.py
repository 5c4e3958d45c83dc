"""Static index math for the binary subgoal tree.

The reference stores the tree as linked per-level Python objects with df/bf
accessor views and index converters (gcp/prediction/utils/tree_utils.py). Here
the tree is a dense breadth-first array ``[B, 2^L - 1, ...]`` and every
conversion is a precomputed static permutation — a single XLA gather instead of
Python slicing.

Conventions (identical to the reference):
- breadth-first (bf): level order; node k of level d sits at index 2^d - 1 + k.
- depth-first (df): in-order traversal (left subtree, node, right subtree),
  which equals the temporal order of the predicted frames.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def df2bf_perm(depth: int) -> np.ndarray:
    """perm such that ``df_array = bf_array[..., perm, :]``.

    perm[i] = bf index of the node at df position i (tree_utils.py:235-244).
    """
    n = 2 ** depth - 1
    df_indices = np.arange(1, n + 1)  # 1-based df positions
    bf_indices = np.zeros(n, dtype=np.int64)
    for i in range(depth):
        # nodes in layer i from the bottom have df position divisible by 2^i
        # but not 2^(i+1)
        mask = (df_indices % (2 ** i) == 0) & (df_indices % (2 ** (i + 1)) > 0)
        bf_indices[mask] = df_indices[mask] // (2 ** (i + 1)) + (
            2 ** (depth - i - 1) - 1
        )
    return bf_indices


@functools.lru_cache(maxsize=None)
def bf2df_perm(depth: int) -> np.ndarray:
    """perm such that ``bf_array = df_array[..., perm, :]``
    (inverse of df2bf_perm; tree_utils.py:247-258)."""
    fwd = df2bf_perm(depth)
    inv = np.zeros_like(fwd)
    inv[fwd] = np.arange(len(fwd))
    return inv


def ind_df2bf(df_indices: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Map df node indices to bf node indices (dynamic variant)."""
    perm = jnp.asarray(df2bf_perm(depth))
    return perm[df_indices]


def ind_bf2df(bf_indices: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Map bf node indices to df node indices (dynamic variant)."""
    perm = jnp.asarray(bf2df_perm(depth))
    return perm[bf_indices]


def depthfirst2breadthfirst(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Reorder a df node axis into bf order (tree_utils.py:217-219).

    bf_array[k] = df_array[df_position_of_bf_node_k], i.e. gather with
    bf2df_perm.
    """
    depth = int(np.log2(x.shape[axis] + 1))
    perm = jnp.asarray(bf2df_perm(depth))
    return jnp.take(x, perm, axis=axis)


def breadthfirst2depthfirst(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Reorder a bf node axis into df (temporal) order."""
    depth = int(np.log2(x.shape[axis] + 1))
    perm = jnp.asarray(df2bf_perm(depth))
    return jnp.take(x, perm, axis=axis)


def depthfirst2layers(x: jnp.ndarray, axis: int = 1):
    """Split a df node axis into per-level arrays, top level first
    (tree_utils.py:222-232). Level d has 2^d nodes in left-to-right order."""
    depth = int(np.log2(x.shape[axis] + 1))
    bf = depthfirst2breadthfirst(x, axis=axis)
    return split_by_layer_bf(bf, axis=axis, depth=depth)


def split_by_layer_bf(x: jnp.ndarray, axis: int = 1, depth: int | None = None):
    """Split a bf node axis into per-level arrays (tree_utils.py:155-163)."""
    if depth is None:
        depth = int(np.log2(x.shape[axis] + 1))
    out = []
    start = 0
    for d in range(depth):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + 2 ** d)
        out.append(x[tuple(idx)])
        start += 2 ** d
    return out


def per_level_means(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Mean of a bf node-axis array per tree level -> [depth]
    (layerwise loss logging, tree_module.py:159-169)."""
    import math as _math

    n = x.shape[axis]
    depth = int(_math.log2(n + 1))
    parts = split_by_layer_bf(x, axis=axis % x.ndim, depth=depth)
    return jnp.stack([p.mean() for p in parts])


def interleave(t1: jnp.ndarray, t2: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """[a0, a1, ...], [b0, b1, ...] -> [a0, b0, a1, b1, ...]
    (tree_utils.py:202-208): builds the next level's left/right parent arrays."""
    stacked = jnp.stack([t1, t2], axis=axis + 1)
    shape = list(t1.shape)
    shape[axis] = shape[axis] * 2
    return stacked.reshape(shape)


def balanced_timesteps(depth: int, end_ind: jnp.ndarray) -> jnp.ndarray:
    """Float matching timesteps of every bf node under balanced binding.

    The reference computes these by midpoint recursion from the virtual
    boundary nodes t_start = -1, t_end = end_ind + 1
    (frame_binding.py:52-65, tree.py:30-32). Bisection of an interval is
    affine, so node k of level d (0-indexed) has the closed form
        t = -1 + (end_ind + 2) * (2k + 1) / 2^(d+1).

    :param end_ind: [B] int array.
    :return: [B, 2^depth - 1] float timesteps in bf order.
    """
    alphas = []
    for d in range(depth):
        k = np.arange(2 ** d, dtype=np.float32)
        alphas.append((2 * k + 1) / 2 ** (d + 1))
    alpha = jnp.asarray(np.concatenate(alphas))  # [N]
    e = end_ind.astype(jnp.float32)[:, None]
    return -1.0 + (e + 2.0) * alpha[None, :]
