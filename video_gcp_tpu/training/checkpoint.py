"""Checkpointing: epoch-named orbax checkpoints with 'latest' resolution,
scoped/submodule restore and run provenance.

Mirrors the reference's CheckpointHandler semantics
(gcp/prediction/training/checkpoint_handler.py:14-184): checkpoints live in
{exp_path}/weights/ named by epoch, `resume='latest'|<int>` resolves to a
concrete checkpoint, submodules can be extracted by param-tree prefix (the
planner loads only `cost_mdl`, checkpoint_handler.py:132-143), and every run
dumps its command line + git rev for provenance (checkpoint_handler.py:166-184).
"""
from __future__ import annotations

import os
import re
import subprocess
import sys
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from video_gcp_tpu.core.attrdict import AttrDict


def weights_dir(exp_path: str) -> str:
    return os.path.join(exp_path, "weights")


def ckpt_name(epoch: int) -> str:
    return f"weights_ep{epoch}"


def get_epochs(exp_path: str):
    wd = weights_dir(exp_path)
    if not os.path.isdir(wd):
        return []
    eps = []
    for d in os.listdir(wd):
        m = re.fullmatch(r"weights_ep(\d+)", d)
        if m:
            eps.append(int(m.group(1)))
    return sorted(eps)


def resolve_resume(resume, exp_path: str) -> Optional[str]:
    """'latest' | int | explicit path -> checkpoint dir or None."""
    if resume is None or resume == "none":
        return None
    if isinstance(resume, str) and os.path.isdir(resume):
        return resume
    if (isinstance(resume, str) and resume.endswith(".npz")
            and os.path.isfile(resume)):
        return resume
    eps = get_epochs(exp_path)
    if not eps:
        return None
    if resume == "latest":
        epoch = eps[-1]
    else:
        epoch = int(resume)
        if epoch not in eps:
            raise ValueError(f"No checkpoint for epoch {epoch} in {exp_path}")
    return os.path.join(weights_dir(exp_path), ckpt_name(epoch))


def save_checkpoint(exp_path: str, epoch: int, state: Any) -> str:
    """Save {step, params, opt_state} under weights/weights_ep{epoch}."""
    path = os.path.join(weights_dir(exp_path), ckpt_name(epoch))
    ckptr = ocp.StandardCheckpointer()
    payload = dict(step=state.step, params=state.params,
                   opt_state=state.opt_state)
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target_state: Any) -> Any:
    """Restore into a TrainState template (shapes/dtypes from target)."""
    ckptr = ocp.StandardCheckpointer()
    template = dict(step=target_state.step, params=target_state.params,
                    opt_state=target_state.opt_state)
    restored = ckptr.restore(os.path.abspath(path), template)
    return target_state.replace(step=restored["step"],
                                params=restored["params"],
                                opt_state=restored["opt_state"])


def load_params(path: str) -> Any:
    """Restore only model parameters (planner-side weight loading,
    planner_policy.py:48-50)."""
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    return restored["params"]


def load_pretrained_npz(path: str) -> Any:
    """Rebuild model params from a flat `np.savez` checkpoint (the shipped
    pretrained_ep74.npz format, PRETRAINED.md).

    Keys are '/'-joined paths of the flattened train state minus the
    optimizer: 'params/params/<module>/.../kernel' — the first 'params' is
    the TrainState field, the second the flax collection — plus a scalar
    'step'. float16-stored leaves are cast back to float32. Returns the
    value of the top-level 'params' entry, i.e. `{'params': {<module>:
    ...}}`, which seeds `trainer.state.params` / `model.apply` directly.
    """
    import numpy as np

    z = np.load(path)
    tree: dict = {}
    for key in z.files:
        if key == "step":
            continue
        parts = key.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        leaf = z[key]
        if leaf.dtype == np.float16:
            leaf = leaf.astype(np.float32)
        node[parts[-1]] = leaf
    if "params" not in tree:
        raise ValueError(
            f"{path}: no 'params/...' keys — not a pretrained-npz checkpoint")
    return tree["params"]


def save_pretrained_npz(path: str, params: Any, step: int = 0) -> None:
    """Inverse of `load_pretrained_npz`: flatten `params` (the TrainState
    params field, i.e. `{'params': {<module>: ...}}`) into '/'-joined keys
    under a leading 'params/' segment, cast float32 leaves to float16 for
    size, and `np.savez_compressed` with a scalar 'step' (the shipped
    pretrained_ep74.npz format, PRETRAINED.md)."""
    import numpy as np

    flat: dict = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(prefix + (str(k),), v)
        else:
            arr = np.asarray(jax.device_get(node))
            if arr.dtype == np.float32:
                arr = arr.astype(np.float16)
            flat["/".join(prefix)] = arr

    walk(("params",), jax.device_get(params))
    flat["step"] = np.asarray(int(step))
    np.savez_compressed(path, **flat)


def extract_subtree(params: Any, scope: str) -> Any:
    """Extract a submodule's params by top-level key path, e.g. 'cost_mdl'
    (checkpoint_handler.py:132-143)."""
    node = params["params"] if "params" in params else params
    for part in scope.split("/"):
        if part not in node:
            raise ValueError(f"No scope {scope!r} in checkpoint params")
        node = node[part]
    return node


def save_provenance(exp_path: str) -> None:
    """Dump command line and git rev/diff (checkpoint_handler.py:166-184)."""
    os.makedirs(exp_path, exist_ok=True)
    with open(os.path.join(exp_path, "cmd.txt"), "a") as f:
        f.write(" ".join(sys.argv) + "\n")
    try:
        rev = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                             text=True, timeout=10).stdout.strip()
        diff = subprocess.run(["git", "diff"], capture_output=True, text=True,
                              timeout=10).stdout
        with open(os.path.join(exp_path, "git_info.txt"), "w") as f:
            f.write(rev + "\n\n" + diff)
    except Exception:
        pass
