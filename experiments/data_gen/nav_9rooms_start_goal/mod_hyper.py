"""Benchmark start/goal configurations for the 9-room control suite:
PRM-expert demos saved in raw format (pngs + obs pkl), the layout
BenchmarkAgent._load_raw_data reads back (the published datasets ship the
same under nav_9rooms/start_goal_configs; reference:
experiments/data_gen/nav_16rooms/mod_hyper.py + benchmarking_agent.py:39-91).
"""
import os.path

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.planning.infra.agent.general_agent import GeneralAgent
from video_gcp_tpu.planning.infra.envs.multiroom2d import TopdownMultiroom2dEnv
from video_gcp_tpu.planning.infra.policy.prm_policy.prm_policy import PrmPolicy

current_dir = os.path.dirname(os.path.realpath(__file__))

env_params = {
    'init_pos': None,
    'goal_pos': None,
    'n_rooms': 9,
    'heading_smoothing': 0.1,
    'crop_window': 40,
}

agent = AttrDict(
    type=GeneralAgent,
    env=(TopdownMultiroom2dEnv, env_params),
    T=100,
    make_final_gif=False,
    image_height=32,
    image_width=32,
)

policy = AttrDict(
    type=PrmPolicy,
    max_traj_length=agent.T,
)

config = AttrDict(
    current_dir=current_dir,
    start_index=0,
    end_index=99,
    agent=agent,
    policy=policy,
    save_format=['raw'],
    data_save_dir=(os.environ.get('GCP_DATA_DIR', '/tmp/gcp_data')
                   + '/nav_9rooms/start_goal_configs'),
    split_train_val_test=False,
    traj_per_file=1,
)
