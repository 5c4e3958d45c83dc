"""Environment rollout agent with retry-on-failure and obs caching.

Reference: gcp/planning/infra/agent/general_agent.py:23-340 (Visual-Foresight
fork) + benchmarking_agent.py:11-94. Runs one trajectory per `sample`: resets
env, loops policy.act (arguments filled by signature reflection,
policy.get_policy_args), caches resized observations over time, retries up to
N_MAX_TRIALS on failure, optionally rejection-samples until the goal is
reached, and dumps per-trajectory gifs.
"""
from __future__ import annotations

import glob
import os
import pickle

import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.params import ParamDict
from video_gcp_tpu.planning.infra.policy.policy import get_policy_args

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class Image_Exception(Exception):
    pass


class Environment_Exception(Exception):
    pass


def resize_store(t, target_array, input_array):
    """Resize per-camera images into the cache (im_utils.resize_store)."""
    target_h, target_w = target_array.shape[2:4]
    for c in range(input_array.shape[0]):
        img = input_array[c]
        if img.shape[0] != target_h or img.shape[1] != target_w:
            img = cv2.resize(img, (target_w, target_h),
                             interpolation=cv2.INTER_AREA)
        target_array[t, c] = img


def npy_to_gif(images, path, fps=4):
    """Save frame list as gif (im_utils.npy_to_gif); falls back to mp4-less
    PNG strip when imageio is unavailable."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        import imageio

        imageio.mimsave(path + ".gif", images, fps=fps)
    except ImportError:
        strip = np.concatenate(images[:: max(len(images) // 10, 1)], axis=1)
        cv2.imwrite(path + ".png", strip[..., ::-1])


class GeneralAgent:
    N_MAX_TRIALS = 100

    def __init__(self, hyperparams, start_goal_list=None):
        self._hp = self._default_hparams()
        self.override_defaults(hyperparams)
        self.T = self._hp.T
        self._start_goal_list = start_goal_list
        self._goal = None
        self._goal_seq = None
        self._goal_image = None
        self._demo_images = None
        self._reset_state = None
        self._setup_world(0)

    def override_defaults(self, config):
        for name, value in config.items():
            self._hp[name] = value

    def _default_hparams(self):
        return ParamDict(
            T=None, adim=None, sdim=None, ncam=1,
            rejection_sample=False, type=None, env=None,
            image_height=48, image_width=64, nchannels=3,
            data_save_dir="", log_dir="",
            make_final_gif=True, make_final_gif_freq=1,
            make_final_gif_pointoverlay=False,
            gen_xml=(True, 1),  # re-setup env every N trajectories
            start_goal_confs=None, show_progress=False,
            do_not_save_images=False,
        )

    def _setup_world(self, itr):
        env_type, env_params = self._hp.env
        env_params = dict(env_params)
        if self._start_goal_list is not None:
            env_params["init_pos"] = self._start_goal_list[itr, 0]
            env_params["goal_pos"] = self._start_goal_list[itr, 1]
        self.env = env_type(env_params, self._reset_state)
        self._hp.adim = self.adim = self.env.adim
        self._hp.sdim = self.sdim = self.env.sdim
        self._hp.ncam = self.ncam = self.env.ncam

    # ------------------------------------------------------------------

    def sample(self, policy, i_traj):
        self.i_traj = i_traj
        # periodic env re-setup: the benchmark agent reloads the trajectory's
        # start/goal configuration here (general_agent.py:110-112,
        # benchmarking_agent.py:20 forces gen_xml=(True, 1))
        if self._hp.gen_xml[0]:
            if i_traj % self._hp.gen_xml[1] == 0 and i_traj > 0:
                self._setup_world(i_traj)
        traj_ok, obs_dict, policy_outs, agent_data = False, None, None, None
        i_trial = 0
        while not traj_ok and i_trial < self.N_MAX_TRIALS:
            i_trial += 1
            try:
                agent_data, obs_dict, policy_outs = self.rollout(
                    policy, i_trial, i_traj
                )
                traj_ok = agent_data["traj_ok"]
            except Image_Exception:
                traj_ok = False
        if self._hp.make_final_gif:
            if i_traj % self._hp.make_final_gif_freq == 0:
                self.save_gif(i_traj)
        self._reset_state = None
        return agent_data, obs_dict, policy_outs

    def rollout(self, policy, i_trial, i_traj):
        self._init()
        agent_data, policy_outputs = {}, []
        t = 0
        done = self._hp.T <= 0
        initial_env_obs, self._reset_state = self.env.reset(self._reset_state)
        obs = self._post_process_obs(initial_env_obs, agent_data, True)
        policy.reset()
        while not done:
            pi_t = policy.act(
                **get_policy_args(policy, obs, t, i_traj, agent_data)
            )
            policy_outputs.append(pi_t)
            if "done" in pi_t:
                done = pi_t["done"]
            try:
                obs = self._post_process_obs(
                    self.env.step(pi_t["actions"]), agent_data
                )
            except Environment_Exception:
                return {"traj_ok": False}, None, None
            if (self._hp.T - 1) == t or obs["env_done"][-1]:
                done = True
            t += 1

        traj_ok = self.env.valid_rollout()
        if self._hp.rejection_sample:
            if self._hp.rejection_sample > i_trial:
                traj_ok = self.env.goal_reached()
        self._required_rollout_metadata(agent_data, traj_ok, t, i_trial)
        return agent_data, obs, policy_outputs

    def _post_process_obs(self, env_obs, agent_data, initial_obs=False):
        h, w = self._hp.image_height, self._hp.image_width
        if initial_obs:
            t_cache = self._hp.T + 1
            self._agent_cache = {}
            for k in env_obs:
                if k == "images":
                    self._agent_cache["images"] = np.zeros(
                        (t_cache, self._hp.ncam, h, w, self._hp.nchannels),
                        dtype=np.uint8,
                    )
                elif isinstance(env_obs[k], np.ndarray):
                    self._agent_cache[k] = np.zeros(
                        (t_cache,) + env_obs[k].shape, dtype=env_obs[k].dtype
                    )
                else:
                    self._agent_cache[k] = []
            self._cache_cntr = 0

        t = self._cache_cntr
        self._cache_cntr += 1
        obs = {}
        for k in env_obs:
            if k == "images":
                resize_store(t, self._agent_cache["images"], env_obs["images"])
                self.gif_images_traj.append(self._agent_cache["images"][t, 0])
            elif isinstance(env_obs[k], np.ndarray):
                self._agent_cache[k][t] = env_obs[k]
            else:
                self._agent_cache[k].append(env_obs[k])
            obs[k] = self._agent_cache[k][: self._cache_cntr]
        if self._goal_image is not None:
            agent_data["goal_image"] = self._goal_image
        if self._goal is not None:
            agent_data["goal"] = self._goal
        if self._demo_images is not None:
            agent_data["demo_images"] = self._demo_images
        if self._reset_state is not None:
            agent_data["reset_state"] = self._reset_state
            obs["reset_state"] = self._reset_state
        return obs

    def _required_rollout_metadata(self, agent_data, traj_ok, t, i_tr):
        agent_data["term_t"] = t - 1
        if hasattr(self.env, "goal_reached"):
            try:
                agent_data["goal_reached"] = self.env.goal_reached()
            except NotImplementedError:
                pass
        agent_data["traj_ok"] = traj_ok

    def save_gif(self, i_traj, overlay=False):
        path = os.path.join(self._hp.log_dir, f"verbose/traj{i_traj}/video")
        npy_to_gif(self.gif_images_traj, path)

    def _init(self):
        self.gif_images_traj, self.topdown_images = [], []


class BenchmarkAgent(GeneralAgent):
    """1-trial evaluation agent; loads start/goal confs from disk and adds
    env.eval() stats (benchmarking_agent.py:11-94)."""

    N_MAX_TRIALS = 1

    def __init__(self, hyperparams, start_goal_list=None):
        self._start_goal_confs = hyperparams.get("start_goal_confs", None)
        super().__init__(hyperparams, start_goal_list)

    def _setup_world(self, itr):
        super()._setup_world(itr)
        if self._start_goal_confs is not None:
            self._reset_state = self._load_raw_data(itr)

    def _required_rollout_metadata(self, agent_data, traj_ok, t, i_itr):
        super()._required_rollout_metadata(agent_data, traj_ok, t, i_itr)
        agent_data.update(self.env.eval())

    def get_reset_state(self, obs_dict):
        return self.env.get_reset_from_obs(obs_dict)

    def _load_raw_data(self, itr):
        """Reverse of RawSaver.save_raw_data (benchmarking_agent.py:39-91)."""
        ngroup = 1000
        igrp = itr // ngroup
        traj_folder = os.path.join(
            self._start_goal_confs, f"traj_group{igrp}", f"traj{itr}"
        )
        num_files = len(glob.glob(f"{traj_folder}/images0/*.png"))
        assert num_files > 0, f"no files found in {traj_folder}!"

        obs_dict = {}
        h, w = self._hp.image_height, self._hp.image_width
        demo_images = np.zeros((num_files, self.ncam, h, w, 3))
        for t in [0, num_files - 1]:
            for c in range(self.ncam):
                image_file = f"{traj_folder}/images{c}/im_{t}.png"
                img = cv2.imread(image_file)[..., ::-1]
                if img.shape[0] != h or img.shape[1] != w:
                    img = cv2.resize(img, (w, h))
                demo_images[t, c] = img
        self._demo_images = demo_images.astype(np.float32) / 255.0
        self._goal_image = self._demo_images[-1]

        with open(f"{traj_folder}/obs_dict.pkl", "rb") as f:
            obs_dict.update(pickle.load(f))
        self._goal = self.env.get_goal_from_obs(obs_dict)
        return self.env.get_reset_from_obs(obs_dict)


class BenchmarkAgentLoadHDF5(BenchmarkAgent):
    """Benchmark agent loading start/goal confs from an hdf5 trajectory file
    (benchmarking_agent_load_hdf5.py:9-42): start state = first frame's state,
    goal = last valid frame."""

    def _load_raw_data(self, itr):
        import h5py

        path = self._start_goal_confs
        if not path.endswith(".h5"):
            import glob as _glob

            files = sorted(_glob.glob(os.path.join(path, "**/*.h5"),
                                      recursive=True))
            assert files, f"no h5 files under {path}"
            path = files[itr % len(files)]
            itr = itr // len(files)
        with h5py.File(path, "r") as f:
            tpf = int(f["traj_per_file"][()])
            key = f"traj{itr % tpf}"
            states = f[key + "/states"][()]
            pad_mask = f[key + "/pad_mask"][()]
            end = int(np.argmax(pad_mask * np.arange(len(pad_mask))))
            images = f[key + "/images"][()] if key + "/images" in f else None
        if images is not None:
            h, w = self._hp.image_height, self._hp.image_width
            goal_img = images[end].astype(np.float32) / 255.0
            if goal_img.ndim == 3:
                goal_img = goal_img[None]
            self._goal_image = np.stack(
                [cv2.resize(goal_img[c], (w, h)) for c in range(goal_img.shape[0])]
            )[None]
            self._demo_images = None
        self._goal = states[end, -2:] if states.shape[-1] > 3 else states[end, :2]
        start = states[0]
        return np.concatenate([start[:2], [0.0], self._goal])
