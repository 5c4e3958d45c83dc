"""Sequential VRNN predictor (reference: base_configs/gcp_sequential.py)."""
from video_gcp_tpu.models.sequential import SequentialModel

configuration = {
    'model': SequentialModel,
    'logger': 'hierarchy',
}

model_config = {
    'one_step_planner': 'continuous',
    'dense_rec_type': 'svg',
    'hierarchy_levels': 0,
    'add_weighted_pixel_copy': True,
}
