"""Base tree config (reference: experiments/prediction/base_configs/base_tree.py)."""
from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.models.tree import TreeModel

configuration = AttrDict(
    model=TreeModel,
    logger='hierarchy',
)

model_config = {
    'one_step_planner': 'sh_pred',
    'hierarchy_levels': 7,
    'binding': 'loss',
    'seq_enc': 'conv',
    'tree_lstm': 'split_linear',
    'lstm_init': 'mlp',
    'add_weighted_pixel_copy': True,
    'dense_rec_type': 'node_prob',
}
