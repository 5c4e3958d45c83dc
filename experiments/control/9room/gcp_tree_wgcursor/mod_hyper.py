"""Control intervention A+C combined: wide-gap inverse model + plan tracking.

The round-5d 10-task A/B showed the two best interventions attack different
halves of the same failure loop (r4 analysis: collisions stall the agent, the
cursor runs away, the inverse model saturates at wide latent gaps):
  A (widegap, +2 success flips): the inverse model stops saturating for wide
    gaps (inv_mdl fine-tuned at temp_dist 15, scripts/finetune_inv_mdl.py);
  C (cursor, +1 success flip): the executor tracks actual progress so gaps
    stay narrow in the first place (tracking_window=10,
    planner_policy.ImageCEMPolicy._infer_action_localized).
This variant runs both on the same shared task draw to test whether the
effects compose. Like C it is labeled BEYOND REFERENCE (the reference's
closed loop, gcp/planning/planner_policy.py:215-227, has neither mechanism)
and is excluded from headline parity numbers.
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
config.data_save_dir = GCP_EXP_DIR + '/control/nav_9rooms/gcp_tree_wgcursor'
config.policy.checkpt_path = GCP_EXP_DIR + '/prediction/9room/gcp_tree_widegap'
config.policy.tracking_window = 10
