"""Round-5 control baseline: unmodified closed loop, fresh 2k checkpoint.

Identical policy/planner settings to ../gcp_tree/mod_hyper.py (whose log/
holds the committed round-3 artifacts from the earlier checkpoint and task
draw — kept as history); this variant only gets its own log dir so the
round-5 intervention A/B (widegap / replan / cursor, same task draw, same
freshly retrained predictor) has its matching baseline row.
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
config.data_save_dir = GCP_EXP_DIR + '/control/nav_9rooms/gcp_tree_r5base'
