"""9-room adaptive soft-DTW binding with the DLM decoder head.

De-confounds the round-3 three-way table (PARITY.md): the adaptive row there
uses the Gaussian decoder (as the reference's adaptive configs do,
adaptive.py:17-135) while the tree/sequential rows use the
discrete-logistic-mixture head. This config is ../gcp_adaptive/conf.py with
ONLY the decoder switched to DLM, so adaptive-vs-tree on identical data
isolates the binding scheme."""
import importlib.util
import os.path

from video_gcp_tpu.core.attrdict import AttrDict

_base_path = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                          "..", "gcp_adaptive", "conf.py")
_spec = importlib.util.spec_from_file_location("gcp_adaptive_conf", _base_path)
_base = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_base)

configuration = AttrDict(_base.configuration)

model_config = AttrDict(_base.model_config)
model_config.update({
    'decoder_distribution': 'discrete_logistic_mixture',
})
