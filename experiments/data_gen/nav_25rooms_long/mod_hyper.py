"""Long-horizon data generation: PRM expert in the 25-room top-down maze with
a 500-step cap — the h36m-style max_seq_len=500 regime (reference:
README.md:135; gcp/prediction/train.py:80-81 re-derives tree depth from it).
Trajectories are variable-length (path length up to 500), exercising the
var-len h5 reader at long horizon. Images stored at 64x64 (resized to the
model's img_sz at load time)."""
import os.path

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.planning.infra.agent.general_agent import GeneralAgent
from video_gcp_tpu.planning.infra.envs.multiroom2d import TopdownMultiroom2dEnv
from video_gcp_tpu.planning.infra.policy.prm_policy.prm_policy import PrmPolicy

current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'init_pos': None,
    'goal_pos': None,
    'n_rooms': 25,
    'heading_smoothing': 0.1,
    'crop_window': 40,
}

agent = AttrDict(
    type=GeneralAgent,
    env=(TopdownMultiroom2dEnv, env_params),
    T=500,
    make_final_gif=False,
    image_height=64,
    image_width=64,
)

policy = AttrDict(
    type=PrmPolicy,
    max_traj_length=agent.T,
    # doubled plan density: mean path length ~420 steps (vs ~210 at 1.0),
    # pushing real mass toward the 500-frame cap
    subsample_factor=0.5,
)

config = AttrDict(
    current_dir=current_dir,
    start_index=0,
    end_index=399,
    agent=agent,
    policy=policy,
    save_format=['hdf5'],
    data_save_dir=os.environ.get('GCP_DATA_DIR', '/tmp/gcp_data')
                  + '/nav_25rooms_long',
    split_train_val_test=False,
    traj_per_file=1,
)
