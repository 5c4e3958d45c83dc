"""Control intervention B: periodic replanning (baseline checkpoint).

Same setup as ../gcp_tree/mod_hyper.py but replan_interval 30 instead of
T + 2 (never): when wall collisions stall the agent, the original plan's
latent timeline runs away from the true position and the closed-loop inverse
model is queried with ever-wider gaps; replanning restarts the plan from the
actual position every 30 steps. Uses the reference's own replan machinery
(gcp/planning/planner_policy.py:85-99 semantics) — a hyperparameter change,
not a new mechanism.
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
config.data_save_dir = GCP_EXP_DIR + '/control/nav_9rooms/gcp_tree_replan'
config.policy.replan_interval = 30
config.policy.num_max_replans = 8
