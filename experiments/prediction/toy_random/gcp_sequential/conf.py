"""CPU-runnable sequential micro-config on RandomVideoDataset."""
from video_gcp_tpu.core.attrdict import AttrDict
from experiments.prediction.base_configs import gcp_sequential as base_conf
from video_gcp_tpu.data.datasets import RandomVideoDataset

configuration = AttrDict(base_conf.configuration)
configuration.update({
    'dataset_name': None,
    'batch_size': 4,
    'lr': 1e-3,
    'num_epochs': 2,
})

data_config = AttrDict(
    dataset_spec=AttrDict(
        max_seq_len=16,
        dataset_class=RandomVideoDataset,
        state_dim=2,
        n_actions=2,
    ),
)

model_config = dict(base_conf.model_config)
model_config.update({
    'img_sz': 16,
    'ngf': 8,
    'nz_mid_lstm': 64,
    'nz_vae': 16,
})
model_config.pop("add_weighted_pixel_copy")
