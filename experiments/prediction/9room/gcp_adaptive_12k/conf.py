"""9-room adaptive-binding GCP at reference data scale (12k trajectories).

Identical hparams to ../gcp_adaptive/conf.py; only the experiment directory
differs so training starts fresh instead of resuming the 2k-trajectory run.
Companion to ../gcp_tree_12k/conf.py: the round-3 three-way table (PARITY.md)
showed adaptive soft-DTW binding leading every metric at 2k trajectories, and
the ep74-vs-ep199 ablation showed quality is data-bound — so the data-scale
experiment covers the best family too (ref: adaptive binding
gcp/prediction/models/adaptive_binding/adaptive.py:17-135; data scale
README.md:118).
"""
import importlib.util
import os.path

_base_path = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                          "..", "gcp_adaptive", "conf.py")
_spec = importlib.util.spec_from_file_location("gcp_adaptive_conf", _base_path)
_base = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_base)

configuration = _base.configuration
model_config = _base.model_config
