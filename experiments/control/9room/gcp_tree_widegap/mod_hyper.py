"""Control intervention A: wide-gap inverse model (same predictor trunk).

Same hierarchical image-CEM setup as ../gcp_tree/mod_hyper.py; the policy
checkpoint is the inv_mdl-only fine-tune (prediction/9room/gcp_tree_widegap,
scripts/finetune_inv_mdl.py: temp_dist 1 -> 15, all non-inv_mdl params frozen
byte-identical to the baseline), so this A/B isolates the inverse-model
variable on the identical task draw. The learned cost model still loads from
the baseline checkpoint (its params are frozen copies anyway).
"""
import importlib.util
import os.path

_base_path = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                          "..", "gcp_tree", "mod_hyper.py")
_spec = importlib.util.spec_from_file_location("gcp_tree_ctrl", _base_path)
_base = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_base)

GCP_EXP_DIR = os.environ.get('GCP_EXP_DIR', '/tmp/gcp_experiments')
current_dir = os.path.dirname(os.path.realpath(__file__))

config = _base.config
config.current_dir = current_dir
config.data_save_dir = GCP_EXP_DIR + '/control/nav_9rooms/gcp_tree_widegap'
config.policy.checkpt_path = GCP_EXP_DIR + '/prediction/9room/gcp_tree_widegap'
