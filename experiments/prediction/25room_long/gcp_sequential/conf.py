"""Long-horizon (500-frame) sequential VRNN — the controlled counterpart to
../gcp_tree/conf.py for the paper's core tree-vs-sequential claim
(reference: gcp/prediction/models/sequential.py:13-131 one-step predictor vs
tree/; README.md:135 h36m max_seq_len 500). Identical dataset (400-trajectory
nav_25rooms_long), batch size, lr, and epoch budget as the tree run; only the
model family differs. Matches the width/latent hparams of the tree config so
capacity is comparable (512x3 LSTM, nz_enc/mid 128, nz_vae 256)."""
from video_gcp_tpu.core.attrdict import AttrDict
from experiments.prediction.base_configs import gcp_sequential as base_conf

configuration = AttrDict(base_conf.configuration)
configuration.update({
    'dataset_name': 'nav_25rooms_long',
    'batch_size': 16,
    'lr': 2e-4,
    'epoch_cycles_train': 4,
    'n_rooms': 25,
    'metric_pruning_scheme': 'basic',
})

model_config = AttrDict(base_conf.model_config)
model_config.update({
    'ngf': 16,
    'nz_mid_lstm': 512,
    'n_lstm_layers': 3,
    'nz_mid': 128,
    'nz_enc': 128,
    'nz_vae': 256,
    'regress_length': True,
    # Gaussian decoder head — the 25room_long tree run uses the default
    # gaussian head too, keeping the comparison decoder-controlled
})
model_config.pop("add_weighted_pixel_copy")
