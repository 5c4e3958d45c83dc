"""9-room GCP-tree with adaptive soft-DTW binding."""
from video_gcp_tpu.core.attrdict import AttrDict
from experiments.prediction.base_configs import gcp_adaptive as base_conf

configuration = AttrDict(base_conf.configuration)
configuration.update({
    'dataset_name': 'nav_9rooms',
    'batch_size': 16,
    'lr': 2e-4,
    'epoch_cycles_train': 2,
    'n_rooms': 9,
    'metric_pruning_scheme': 'basic',
})

model_config = AttrDict(base_conf.model_config)
model_config.update({
    'hierarchy_levels': 7,
    'ngf': 16,
    'nz_mid_lstm': 512,
    'n_lstm_layers': 3,
    'nz_mid': 128,
    'nz_enc': 128,
    'nz_vae': 256,
    'regress_length': True,
})
model_config.pop("add_weighted_pixel_copy")
