"""nav_25rooms_long dataset config: h36m-style 500-frame horizon in the
25-room maze (reference horizon: README.md:135 h36m max_seq_len 500).
Images are stored pre-rendered (64x64) by the data-gen pipeline, so the
plain var-len reader applies — no train-time re-rendering."""
from video_gcp_tpu.core.attrdict import AttrDict

config = AttrDict(
    dataset_spec=AttrDict(
        max_seq_len=500,
        split=AttrDict(train=0.97, val=0.03, test=0.00),
        state_dim=2,
        n_actions=2,
    ),
    n_rooms=25,
    crop_window=40,
)
