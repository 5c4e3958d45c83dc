"""Toy widegap fixture: toy_random/gcp_tree with a wide-gap inverse model.

CPU-runnable micro-config used to smoke-test scripts/finetune_inv_mdl.py
(the head-only inverse-model fine-tune behind control intervention A) before
it runs against a real checkpoint. Mirrors the relationship between
experiments/prediction/9room/gcp_tree_widegap and its baseline: identical
model, only `inv_mdl_params.temp_dist` differs.
"""
from video_gcp_tpu.core.attrdict import AttrDict
from experiments.prediction.toy_random.gcp_tree import conf as base

configuration = AttrDict(base.configuration)
data_config = base.data_config
model_config = AttrDict(base.model_config)
model_config.update({
    'inv_mdl_params': AttrDict(n_actions=2, temp_dist=5),
})
