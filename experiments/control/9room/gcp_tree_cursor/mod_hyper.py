"""Control intervention C: progress-aware plan tracking (BEYOND REFERENCE).

Same setup as ../gcp_tree/mod_hyper.py but with tracking_window=10: the
closed-loop executor localizes the current frame encoding against the plan's
latent timeline (within a 10-step window past the monotone cursor floor) and
tracks the waypoint after the nearest one, instead of advancing the cursor
once per env step regardless of actual progress
(planner_policy.ImageCEMPolicy._infer_action_localized). Round-4 failure
analysis: ~97% of commanded motion was rejected by wall collisions while the
cursor marched on, so the tracked waypoint ran away and the inverse model
saturated. This changes execution logic beyond the reference's
planner_policy.py:215-227 closed loop — results are labeled beyond-reference
in PARITY.md and excluded from headline parity numbers.
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
config.data_save_dir = GCP_EXP_DIR + '/control/nav_9rooms/gcp_tree_cursor'
config.policy.tracking_window = 10
