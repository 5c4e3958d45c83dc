"""Nested-dict tensor plumbing for JAX pytrees.

The reference framework routes every model input/output through ``blox.AttrDict``
(imported in 49 files of orybkin/video-gcp) plus helpers ``batch_apply``, ``rmap``,
``map_dict``, ``subdict``, ``listdict2dictlist`` (SURVEY.md §2.9). Here AttrDict is a
dict subclass registered as a JAX pytree node with keys, so whole model outputs flow
through ``jit`` / ``grad`` / ``vmap`` unchanged, and ``batch_apply`` becomes a shape
fold (merge leading axes) rather than a module wrapper.
"""
from __future__ import annotations

from typing import Any, Callable, Iterable, Mapping

import jax
import jax.numpy as jnp


class AttrDict(dict):
    """dict with attribute access, registered as a JAX pytree node.

    Unlike blox's AttrDict (torch), this participates natively in jax
    transformations: leaves are traversed in sorted key order, mirroring the
    behavior of plain dicts in jax.tree_util.
    """

    __slots__ = ()

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __delattr__(self, key: str) -> None:
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def copy(self) -> "AttrDict":
        return AttrDict(self)

    def deepcopy(self) -> "AttrDict":
        return jax.tree_util.tree_map(lambda x: x, self)


def _attrdict_flatten(d: AttrDict):
    keys = sorted(d.keys())
    return tuple(d[k] for k in keys), tuple(keys)


def _attrdict_flatten_with_keys(d: AttrDict):
    keys = sorted(d.keys())
    return tuple((jax.tree_util.DictKey(k), d[k]) for k in keys), tuple(keys)


def _attrdict_unflatten(keys, children) -> AttrDict:
    return AttrDict(zip(keys, children))


jax.tree_util.register_pytree_with_keys(
    AttrDict, _attrdict_flatten_with_keys, _attrdict_unflatten, _attrdict_flatten
)


# ---------------------------------------------------------------------------
# dict utilities (blox.basic_types surface, SURVEY.md §2.9)
# ---------------------------------------------------------------------------

def map_dict(fn: Callable, d: Mapping) -> AttrDict:
    """Apply ``fn`` to every value of ``d`` (shallow)."""
    return AttrDict({k: fn(v) for k, v in d.items()})


def subdict(d: Mapping, keys: Iterable[str], strict: bool = True) -> AttrDict:
    if strict:
        return AttrDict({k: d[k] for k in keys})
    return AttrDict({k: d[k] for k in keys if k in d})


def listdict2dictlist(lst: list) -> AttrDict:
    """[{k: v1}, {k: v2}] -> {k: [v1, v2]}. Keys taken from the first element."""
    if not lst:
        return AttrDict()
    return AttrDict({k: [d[k] for d in lst] for k in lst[0]})


def dict_concat(d1: dict, d2: dict, axis: int = 0) -> AttrDict:
    """Concatenate matching array entries of two dicts."""
    return AttrDict(
        {k: jnp.concatenate([d1[k], d2[k]], axis=axis) for k in d1.keys() & d2.keys()}
    )


def rmap(fn: Callable, tree: Any) -> Any:
    """Recursive map over a nested pytree, preserving structure.

    Equivalent of blox ``rmap``; ``None`` leaves are preserved.
    """
    return jax.tree_util.tree_map(fn, tree)


def rmap_ex(fn: Callable, *trees: Any) -> Any:
    """rmap over multiple parallel trees."""
    return jax.tree_util.tree_map(fn, *trees)


# ---------------------------------------------------------------------------
# batch folding (blox.batch_apply surface)
# ---------------------------------------------------------------------------

def merge_dims(x: jnp.ndarray, n: int = 2) -> jnp.ndarray:
    """Merge the leading ``n`` axes into one."""
    return x.reshape((-1,) + x.shape[n:])


def split_dim(x: jnp.ndarray, sizes) -> jnp.ndarray:
    """Split the leading axis into ``sizes``."""
    return x.reshape(tuple(sizes) + x.shape[1:])


def batch_apply(fn: Callable, *args, unshape_inputs: bool = False, **kwargs):
    """Apply ``fn`` over inputs whose leading two axes are [batch, time/node].

    The reference's blox ``batch_apply`` wraps torch modules to fold batch x time
    into one axis (e.g. gcp/prediction/models/base_gcp.py:188,
    gcp/prediction/utils/tree_utils.py:33). In JAX this is a pure reshape fold:
    every array leaf in ``args``/``kwargs`` is reshaped [B, N, ...] -> [B*N, ...],
    ``fn`` is applied once (fully batched — XLA sees one big matmul), and outputs
    are unfolded back to [B, N, ...].
    """
    leaves = [
        l for l in jax.tree_util.tree_leaves((args, kwargs)) if hasattr(l, "shape")
    ]
    if not leaves:
        return fn(*args, **kwargs)
    b, n = leaves[0].shape[:2]

    def fold(x):
        if hasattr(x, "shape") and x.ndim >= 2 and x.shape[:2] == (b, n):
            return merge_dims(x)
        return x

    def unfold(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == b * n:
            return split_dim(x, (b, n))
        return x

    f_args, f_kwargs = jax.tree_util.tree_map(fold, (args, kwargs))
    out = fn(*f_args, **f_kwargs)
    if unshape_inputs:
        return out
    return jax.tree_util.tree_map(unfold, out)
