"""Toy-scale closed-loop control benchmark (integration test)."""
import os.path

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.planning.infra.agent.general_agent import BenchmarkAgent
from video_gcp_tpu.planning.infra.envs.multiroom2d import TopdownMultiroom2dEnv
from video_gcp_tpu.planning.planner_policy import ImageCEMPolicy
from video_gcp_tpu.planning.cem.sampler import ImageHierarchicalTreeCEMSampler
from video_gcp_tpu.planning.cem.cem_planner import HierarchicalImageCEMPlanner
from video_gcp_tpu.planning.cem.cost_fcn import ImageLearnedCostEstimate

current_dir = os.path.dirname(os.path.realpath(__file__))
GCP_EXP_DIR = os.environ.get('GCP_EXP_DIR', '/tmp/gcp_experiments')
GCP_DATA_DIR = os.environ.get('GCP_DATA_DIR', '/tmp/gcp_data')

env_params = {
    'init_pos': None,
    'goal_pos': None,
    'n_rooms': 9,
    'heading_smoothing': 0.1,
    'crop_window': 40,
}

agent = AttrDict(
    type=BenchmarkAgent,
    env=(TopdownMultiroom2dEnv, env_params),
    T=100,
    image_height=16,
    image_width=16,
    start_goal_confs=GCP_DATA_DIR + '/nav_9rooms/start_goal_configs/raw',
)

h_config = AttrDict(
    one_step_planner='sh_pred',
    binding='loss',
    seq_enc='conv',
    tree_lstm='split_linear',
    lstm_init='mlp',
    dense_rec_type='node_prob',
    matching_type='balanced',
    state_dim=2,
    img_sz=16,
    ngf=8,
    max_seq_len=100,
    hierarchy_levels=5,
    nz_mid_lstm=64,
    nz_mid=64,
    nz_enc=64,
    nz_vae=16,
    regress_length=True,
    attach_state_regressor=True,
    attach_inv_mdl=True,
    inv_mdl_params=AttrDict(n_actions=2),
    attach_cost_mdl=True,
    n_actions=2,
)

cem_params = AttrDict(
    prune_final=True,
    horizon=100,
    action_dim=16,
    n_iters=3,
    batch_size=8,
    max_rollout_bs=8,
    n_level_hierarchy=5,
    sampler=ImageHierarchicalTreeCEMSampler,
    sampling_rates_per_layer=[4, 4],
    n_ll_samples=3,
    cost_fcn=ImageLearnedCostEstimate,
    cost_config=AttrDict(
        checkpt_path=GCP_EXP_DIR + '/prediction/toy_nav/gcp_tree',
        input_dim=64,
        cost_params=AttrDict(nz_mid=64),
    ),
)

policy = AttrDict(
    type=ImageCEMPolicy,
    params=h_config,
    checkpt_path=cem_params.cost_config.checkpt_path,
    cem_planner=HierarchicalImageCEMPlanner,
    cem_params=cem_params,
    replan_interval=agent.T + 2,
    closed_loop_execution=True,
)

config = AttrDict(
    current_dir=current_dir,
    start_index=0,
    end_index=0,
    agent=agent,
    policy=policy,
    save_format=['raw'],
    data_save_dir=GCP_EXP_DIR + '/control/toy/gcp_tree',
    split_train_val_test=False,
    traj_per_file=1,
)
