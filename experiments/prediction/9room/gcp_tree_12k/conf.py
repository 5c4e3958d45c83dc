"""9-room GCP-tree at reference data scale (12k trajectories).

Identical hparams to ../gcp_tree/conf.py; only the experiment directory
differs so training starts fresh instead of resuming the 2k-trajectory run.
The `nav_9rooms` dataset dir itself is extended in place (GlobalSplit
re-slices the shuffled file list, data_loader.py:275-289 semantics), so this
config picks up all trajectories present at startup. Rationale: the
ep74-vs-ep199 ablation (PARITY.md) showed the 2k-trajectory dataset, not the
step budget, binds quality; the reference's published runs use 21k
(README.md:118).
"""
import importlib.util
import os.path

_base_path = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                          "..", "gcp_tree", "conf.py")
_spec = importlib.util.spec_from_file_location("gcp_tree_conf", _base_path)
_base = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_base)

configuration = _base.configuration
model_config = _base.model_config
