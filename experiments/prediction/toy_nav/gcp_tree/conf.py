"""CPU-scale tree predictor on generated nav_9rooms data (integration test)."""
import os
from video_gcp_tpu.core.attrdict import AttrDict
from experiments.prediction.base_configs import gcp_tree as base_conf

configuration = AttrDict(base_conf.configuration)
configuration.update({
    'dataset_name': 'nav_9rooms',
    'batch_size': 4,
    'lr': 1e-3,
    'num_epochs': 2,
    'metric_pruning_scheme': 'basic',
    'n_rooms': 9,
})

model_config = AttrDict(base_conf.model_config)
model_config.update({
    'hierarchy_levels': 5,
    'img_sz': 16,
    'ngf': 8,
    'nz_mid_lstm': 64,
    'nz_mid': 64,
    'nz_enc': 64,
    'nz_vae': 16,
    'regress_length': True,
    'attach_state_regressor': True,
    'state_dim': 2,
    'attach_inv_mdl': True,
    'inv_mdl_params': AttrDict(n_actions=2),
    'attach_cost_mdl': True,
    'n_actions': 2,
})
model_config.pop("add_weighted_pixel_copy")

# override the published nav_9rooms split (0.994/0.006) for tiny test datasets
data_config = AttrDict(
    dataset_spec=AttrDict(
        split=AttrDict(train=0.7, val=0.3, test=0.0),
    ),
)
