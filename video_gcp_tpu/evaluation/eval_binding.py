"""Evaluation-time bindings: turn model outputs into dense GT-aligned frames.

Batched device equivalents of gcp/evaluation/evaluation_matching.py — the
reference loops examples in Python and runs Cython DTW per sequence
(compute_metrics.py:94-98); here every scheme is a fixed-shape [B, T, ...]
computation:

- 'dtw'      : min-L2 DTW warp of all df-ordered nodes (DTWEvalBinding:123-149)
- 'basic'    : balanced-schedule per-frame matched node (BalancedEvalBinding:
               174-206; zero-match frames forward-fill the previous node)
- 'pruned_dtw': prune via the existence predictor, compact kept nodes to the
               front (tail repeats the last kept node, mirroring the
               reference's repeat-last-frame padding, BaseEvalBinding:37-45),
               then DTW-warp (BalancedPrunedDTWBinding:209-219)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.ops.dtw import dtw_warp_sequence
from video_gcp_tpu.ops.tree_index import breadthfirst2depthfirst

Array = jnp.ndarray


def _gather_nodes(images: Array, idx: Array) -> Array:
    """images [B, N, ...], idx [B, T] -> [B, T, ...]."""
    expanded = idx.reshape(idx.shape + (1,) * (images.ndim - 2))
    return jnp.take_along_axis(images, expanded, axis=1)


def basic_timeline_index(depth: int, end_ind: Array, max_seq_len: int) -> Array:
    """Per-frame bf node index under the balanced schedule, forward-filling
    frames no node matched (BalancedEvalBinding leaf extraction,
    evaluation_matching.py:174-206, as a dense frame->node map)."""
    from video_gcp_tpu.models.binding import balanced_match_dists

    w = balanced_match_dists(depth, end_ind, max_seq_len)  # [B, N, T]
    has_match = w.sum(1) > 0  # [B, T]
    idx = jnp.argmax(w, axis=1)  # bf node per frame
    t_idx = jnp.arange(max_seq_len)[None, :]
    last_matched = jnp.where(has_match, t_idx, -1)
    last_matched = jax.lax.associative_scan(jnp.maximum, last_matched, axis=1)
    src = jnp.clip(last_matched, 0, max_seq_len - 1)
    return jnp.take_along_axis(idx, src, axis=1)


def tree_dense_sample(outputs: AttrDict, inputs: AttrDict,
                      scheme: str, max_seq_len: int) -> Array:
    """GT-timeline-aligned dense prediction [B, T, ...] from a tree output."""
    images_bf = outputs.tree.images
    images_df = breadthfirst2depthfirst(images_bf)
    end_ind = outputs.get("end_ind", inputs.get("end_ind"))

    if scheme == "dtw":
        warped, _ = dtw_warp_sequence(images_df, inputs.traj_seq, end_ind)
        return warped

    if scheme == "basic":
        import math

        depth = int(math.log2(images_bf.shape[1] + 1))
        idx = basic_timeline_index(depth, end_ind, max_seq_len)
        return _gather_nodes(images_bf, idx)

    if scheme == "pruned_dtw":
        keep = outputs.prune_keep  # [B, N] over df nodes
        n = images_df.shape[1]
        # stable-compact kept nodes to the front; tail repeats last kept node
        order = jnp.argsort(~keep, axis=1, stable=True)  # kept first
        compacted = _gather_nodes(images_df, order)
        n_keep = keep.sum(1)  # [B]
        pos = jnp.arange(n)[None, :]
        last_idx = jnp.clip(n_keep - 1, 0, n - 1)[:, None]
        tail_fixed = jnp.where(pos < n_keep[:, None], pos, last_idx)
        compacted = _gather_nodes(compacted, tail_fixed)
        warped, _ = dtw_warp_sequence(compacted, inputs.traj_seq, end_ind)
        return warped

    raise ValueError(f"unknown pruning scheme {scheme!r}")


def sequential_dense_sample(outputs: AttrDict, inputs: AttrDict,
                            scheme: str, max_seq_len: int) -> Array:
    """Dense sample for the VRNN model (SequentialRecModule.get_sample_with_len,
    sequential.py:70-94): 'basic' returns the rollout as-is; 'dtw' warps frames
    1..end onto the GT timeline (first frame is the GT conditioning frame)."""
    images = outputs.dense_rec.images  # [B, T, ...]
    if scheme == "basic":
        return images
    if scheme == "dtw":
        end_ind = outputs.get("end_ind", inputs.get("end_ind"))
        warped, _ = dtw_warp_sequence(
            images[:, 1:], inputs.traj_seq[:, 1:], end_ind - 1
        )
        return jnp.concatenate([images[:, :1], warped], axis=1)
    raise ValueError(f"unknown pruning scheme {scheme!r} for sequential model")


def dense_sample(outputs: AttrDict, inputs: AttrDict, scheme: str,
                 max_seq_len: int) -> Array:
    if "tree" in outputs:
        return tree_dense_sample(outputs, inputs, scheme, max_seq_len)
    return sequential_dense_sample(outputs, inputs, scheme, max_seq_len)
