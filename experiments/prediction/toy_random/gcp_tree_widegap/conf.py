"""Toy fixture for the wide-gap inverse-model fine-tune path
(scripts/finetune_inv_mdl.py): ../gcp_tree/conf.py with
inv_mdl_params.temp_dist=5. Used by tests and CPU verification drives."""
import importlib.util
import os.path

from video_gcp_tpu.core.attrdict import AttrDict

_base_path = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                          "..", "gcp_tree", "conf.py")
_spec = importlib.util.spec_from_file_location("toy_gcp_tree_conf", _base_path)
_base = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_base)

configuration = AttrDict(_base.configuration)
data_config = AttrDict(_base.data_config)

model_config = AttrDict(_base.model_config)
model_config.inv_mdl_params = AttrDict(model_config.inv_mdl_params)
model_config.inv_mdl_params.temp_dist = 5
