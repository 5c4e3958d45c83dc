"""Action-conditioned, non-goal-conditioned video prediction (VMPC)
(reference: base_configs/vmpc.py)."""
from video_gcp_tpu.core.attrdict import AttrDict
from experiments.prediction.base_configs import gcp_sequential as base_conf

configuration = AttrDict(base_conf.configuration)

model_config = dict(base_conf.model_config)
model_config.update({
    'action_conditioned_pred': True,
    'non_goal_conditioned': True,
    'nz_vae': 0,
    'var_inf': 'deterministic',
})
