"""Export a trained orbax checkpoint as a shippable flat-npz artifact
(PRETRAINED.md format; restorable with `--resume <npz>` or
`checkpoint.load_pretrained_npz`).

Usage:
    python scripts/export_pretrained_npz.py <weights_epN_dir> <out.npz>

Reads the checkpoint directly (no model/dataset build), flattens
(step, params) and drops the optimizer state.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_gcp_tpu.core.platform import apply_platform_env

apply_platform_env()


def main(ckpt_dir: str, out_path: str) -> None:
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from video_gcp_tpu.training.checkpoint import save_pretrained_npz

    # restore as host numpy arrays: the checkpoint's stored shardings may
    # reference devices (the TPU) not present in an export-side process
    ckptr = ocp.PyTreeCheckpointer()
    tree_meta = ckptr.metadata(os.path.abspath(ckpt_dir)).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree_meta)
    restored = ckptr.restore(os.path.abspath(ckpt_dir),
                             restore_args=restore_args)
    step = int(np.asarray(restored["step"]))
    save_pretrained_npz(out_path, restored["params"], step=step)
    print(f"wrote {out_path} ({os.path.getsize(out_path) / 1e6:.1f} MB, "
          f"step {step})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
