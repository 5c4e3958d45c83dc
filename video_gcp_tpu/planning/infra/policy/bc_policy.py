"""Behavioral cloning control policy (test-time).

Reference: gcp/planning/infra/policy/bc_policy.py:9-98. Restores a trained
BCModel checkpoint and runs single-step goal-conditioned actions on images (or
states), threading the recurrent hidden state when the policy is recurrent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.models.bc import BCModel
from video_gcp_tpu.models.hyperparameters import default_hparams
from video_gcp_tpu.planning.infra.policy.policy import Policy
from video_gcp_tpu.training import checkpoint as ckpt_lib


class BehavioralCloningPolicy(Policy):
    def __init__(self, ag_params, policyparams, gpu_id=None, ngpu=None,
                 conversion_fcns=None, n_rooms=None):
        super().__init__()
        self.override_defaults(policyparams)
        params = dict(self._hp.params)
        params["batch_size"] = 1
        hp = default_hparams()
        hp.overwrite(dict(reactive=True))
        hp.overwrite(params)
        self.model = BCModel(hp=dict(hp))

        path = ckpt_lib.resolve_resume(
            self._hp.get("load_epoch", "latest") or "latest",
            self._hp.checkpt_path,
        )
        if path is None:
            raise ValueError(f"no BC checkpoint under {self._hp.checkpt_path}")
        self.params = ckpt_lib.load_params(path)
        self.hidden_var = None

        def run(params, i0, ig, hidden):
            return self.model.apply(
                params, i0, ig, hidden, method=BCModel.act_single
            )

        self._run = jax.jit(run)

    def _default_hparams(self):
        p = super()._default_hparams()
        p.update(dict(params={}, checkpt_path=None, model=None, logger=None,
                      load_epoch=None))
        return p

    def reset(self):
        super().reset()
        self.hidden_var = None

    @staticmethod
    def _preprocess_input(img):
        img = np.asarray(img, np.float32)
        assert img.ndim == 4
        if img.max() > 1.0:
            img = img / 255.0
        if img.min() >= 0.0:
            img = 2 * img - 1.0
        return img

    def act(self, t=None, i_tr=None, images=None, state=None, goal=None,
            goal_image=None):
        self.t = t
        self.i_tr = i_tr
        i0 = self._preprocess_input(images[t])
        ig_src = goal_image[-1] if np.ndim(goal_image) > 4 else goal_image
        ig = self._preprocess_input(np.asarray(ig_src))
        actions, self.hidden_var = self._run(
            self.params, jnp.asarray(i0), jnp.asarray(ig), self.hidden_var
        )
        return AttrDict(actions=np.asarray(actions)[0])

    @property
    def default_action(self):
        return np.zeros(self.model.hp["n_actions"])
