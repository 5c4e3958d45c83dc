"""9-room GCP-tree with a wide-gap inverse model (control intervention A).

Identical to ../gcp_tree/conf.py except `inv_mdl_params.temp_dist=15`: the
inverse-model pairs are sampled with delta in [1, 15] instead of consecutive
frames only (reference trains on temporal distance 1,
gcp/prediction/models/auxilliary_models/inverse_mdl.py:110-179). Round-4
failure analysis (PARITY.md): the consecutive-pair inverse model saturates at
|a| ~ 0.13 for wide latent gaps, which is exactly the regime closed-loop
execution hits when wall collisions stall progress while the plan cursor
advances. The predictor trunk is unchanged; scripts/finetune_inv_mdl.py
fine-tunes ONLY the inv_mdl head from the baseline checkpoint so control A/Bs
isolate the inverse-model variable.
"""
import importlib.util
import os.path

from video_gcp_tpu.core.attrdict import AttrDict

_base_path = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                          "..", "gcp_tree", "conf.py")
_spec = importlib.util.spec_from_file_location("gcp_tree_conf", _base_path)
_base = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_base)

configuration = AttrDict(_base.configuration)

model_config = AttrDict(_base.model_config)
model_config.inv_mdl_params = AttrDict(model_config.inv_mdl_params)
model_config.inv_mdl_params.temp_dist = 15
