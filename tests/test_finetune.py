"""Head-only inverse-model fine-tune (scripts/finetune_inv_mdl.py).

Control intervention A retrains ONLY the inv_mdl head on wide-gap pairs
(reference trains consecutive pairs, inverse_mdl.py:110-179); the control
A/B is valid only if everything else stays byte-identical to the baseline
checkpoint. This drives the actual script end-to-end on the toy fixture and
pins that freeze invariant.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class TestInvMdlFinetune:
    def test_script_freezes_everything_but_inv_mdl(self, tmp_path):
        # GCP_PLATFORM=cpu: the conftest CPU override only fixes THIS
        # process; the sitecustomize axon hijack would route the bare
        # subprocesses onto the TPU tunnel without it.
        env = dict(os.environ, GCP_EXP_DIR=str(tmp_path), GCP_PLATFORM="cpu")
        subprocess.run(
            [sys.executable, "-m", "video_gcp_tpu.training.train",
             "--path", "experiments/prediction/toy_random/gcp_tree",
             "--num_epochs", "1", "--resume", "none"],
            cwd=REPO, env=env, check=True, timeout=600)
        base_dir = tmp_path / "prediction/toy_random/gcp_tree/weights/weights_ep0"
        assert base_dir.is_dir()

        subprocess.run(
            [sys.executable, "scripts/finetune_inv_mdl.py",
             "--path", "experiments/prediction/toy_random/gcp_tree_widegap",
             "--base", str(base_dir), "--epochs", "1"],
            cwd=REPO, env=env, check=True, timeout=600)
        ft_dir = (tmp_path /
                  "prediction/toy_random/gcp_tree_widegap/weights/weights_ep0")
        assert ft_dir.is_dir()

        import jax

        from video_gcp_tpu.training import checkpoint as ckpt

        base = ckpt.load_params(str(base_dir))
        ft = ckpt.load_params(str(ft_dir))
        changed, violations = 0, []
        for (pb, lb), (pf, lf) in zip(
                jax.tree_util.tree_leaves_with_path(base),
                jax.tree_util.tree_leaves_with_path(ft)):
            assert pb == pf, "param tree topology diverged"
            eq = np.array_equal(np.asarray(lb), np.asarray(lf))
            if any(getattr(k, "key", None) == "inv_mdl" for k in pb):
                changed += not eq
            elif not eq:
                violations.append(jax.tree_util.keystr(pb))
        assert changed > 0, "fine-tune did not touch the inv_mdl head"
        assert not violations, f"frozen params changed: {violations[:5]}"
