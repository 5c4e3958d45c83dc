"""Control benchmark: flat (non-hierarchical) CEM over tree latents with
the trained GCP predictor — the "sequential planning" ablation
(reference: experiments/control/9room/gcp_sequential/mod_hyper.py)."""
import os.path

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.planning.infra.agent.general_agent import BenchmarkAgent
from video_gcp_tpu.planning.infra.envs.multiroom2d import TopdownMultiroom2dEnv
from video_gcp_tpu.planning.planner_policy import ImageCEMPolicy
from video_gcp_tpu.planning.cem.sampler import SimpleTreeCEMSampler
from video_gcp_tpu.planning.cem.cem_planner import HierarchicalImageCEMPlanner
from video_gcp_tpu.planning.cem.cost_fcn import ImageWrappedLearnedCostFcn

from experiments.prediction.base_configs import gcp_tree as base_conf

current_dir = os.path.dirname(os.path.realpath(__file__))
GCP_EXP_DIR = os.environ.get('GCP_EXP_DIR', '/tmp/gcp_experiments')

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
    T=200,
    image_height=32,
    image_width=32,
    start_goal_confs=os.environ.get('GCP_DATA_DIR', '/tmp/gcp_data')
                     + '/nav_9rooms/start_goal_configs/raw',
)

h_config = AttrDict(base_conf.model_config)
h_config.update({
    'state_dim': 2,
    'ngf': 16,
    'max_seq_len': 100,
    'hierarchy_levels': 7,
    'nz_mid_lstm': 512,
    'n_lstm_layers': 3,
    'nz_mid': 128,
    'nz_enc': 128,
    'nz_vae': 256,
    'regress_length': True,
    'attach_state_regressor': True,
    'attach_inv_mdl': True,
    'inv_mdl_params': AttrDict(
        n_actions=2,
        use_convs=False,
        build_encoder=False,
    ),
    'decoder_distribution': 'discrete_logistic_mixture',
})
h_config.pop("add_weighted_pixel_copy")

cem_params = AttrDict(
    prune_final=True,
    horizon=100,
    action_dim=256,
    verbose=True,
    n_iters=1,
    batch_size=5,
    elite_frac=1.0,
    n_level_hierarchy=7,
    sampler=SimpleTreeCEMSampler,
    cost_fcn=ImageWrappedLearnedCostFcn,
    cost_config=AttrDict(
        checkpt_path=GCP_EXP_DIR + '/prediction/9room/gcp_tree',
        input_dim=128,
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
    end_index=99,
    agent=agent,
    policy=policy,
    save_format=['raw'],
    data_save_dir=GCP_EXP_DIR + '/control/nav_9rooms/gcp_sequential',
    split_train_val_test=False,
    traj_per_file=1,
)
