from video_gcp_tpu.models.hyperparameters import default_hparams
from video_gcp_tpu.models.sequential import SequentialModel
from video_gcp_tpu.models.tree import TreeModel
