"""Control benchmark with the 12k-trajectory GCP-tree checkpoint.

Same hierarchical image-CEM setup as ../gcp_tree/mod_hyper.py; only the
predictor/cost checkpoint path (prediction/9room/gcp_tree_12k) and the save
dirs differ.
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
config.data_save_dir = GCP_EXP_DIR + '/control/nav_9rooms/gcp_tree_12k'

_ckpt = GCP_EXP_DIR + '/prediction/9room/gcp_tree_12k'
config.policy.checkpt_path = _ckpt
config.policy.cem_params.cost_config.checkpt_path = _ckpt
