"""Datasets: variable-length h5 video trajectories + synthetic fixtures.

Host-side numpy pipeline producing the framework's batch contract
(README.md:80-92 of the reference; gcp/datasets/data_loader.py:56-82):

    traj_seq   [T, H, W, C] float32 in [-1, 1] (NHWC — TPU channel-last;
               the reference is channel-first) or [T, state_dim]
    pad_mask   [T] float32, 1 = real frame
    I_0, I_g   first / goal frame
    end_ind    int, index of last real frame
    start_ind  int (always 0 after cropping, data_loader.py:189)
    traj_seq_states [T, state_dim], actions [T-1, n_actions] (optional)

h5 layout matches the reference exactly: files contain `traj{i}/images`
(uint8 [T, H, W, C] or [T, n_cam, H, W, C]), `states`, `actions`, `pad_mask`
and a global `traj_per_file` (data_loader.py:134-155), so the reference's
published datasets load unchanged.
"""
from __future__ import annotations

import glob
import hashlib
import os
import random
from typing import Optional

import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def resize_video(video: np.ndarray, size) -> np.ndarray:
    """[T, H, W, C] uint8 -> resized (cv2 area interpolation)."""
    if video.shape[1] == size[0] and video.shape[2] == size[1]:
        return video
    t = video.shape[0]
    if video.shape[1:3] == tuple(size):
        return video
    out = np.empty((t, size[0], size[1], video.shape[-1]), dtype=video.dtype)
    for i in range(t):
        out[i] = cv2.resize(video[i], (size[1], size[0]),
                            interpolation=cv2.INTER_AREA)
    return out


class BaseVideoDataset:
    """Phase split, image/state selection, I_0/I_g/pad_mask derivation
    (data_loader.py:23-102)."""

    def __init__(self, data_dir, mpar, data_conf, phase, shuffle=True,
                 dataset_size=-1):
        self.phase = phase
        self.data_dir = data_dir
        self.spec = data_conf.get("dataset_spec", AttrDict())
        self.data_conf = data_conf
        self.dataset_size = dataset_size
        self.shuffle = shuffle and phase == "train"
        self.use_states = not mpar.get("use_convs", True)
        self.img_sz = mpar.get("img_sz", 32)
        self.randomize_length = mpar.get("randomize_length", False)
        self.randomize_start = mpar.get("randomize_start", False)
        self.states_mean = self.spec.get("states_mean", None)
        self.states_std = self.spec.get("states_std", None)
        # subclasses that re-render observations from states (maze top-down)
        # set this False: skips the h5 image read + resize entirely, which
        # otherwise dominates loading (stored frames would be discarded)
        self.load_h5_images = True
        self._rng = np.random.RandomState()

    @property
    def max_seq_len(self):
        return self.spec["max_seq_len"]

    def process_data_dict(self, data_dict: AttrDict) -> AttrDict:
        if "images" in data_dict:
            data_dict.traj_seq_images = data_dict.pop("images")
        if "states" in data_dict:
            data_dict.traj_seq_states = data_dict.pop("states")
            if self.states_mean is not None:
                data_dict.traj_seq_states = (
                    data_dict.traj_seq_states - self.states_mean
                ) / (1e-6 + self.states_std)

        if "traj_seq_images" in data_dict and data_dict.traj_seq_images.ndim > 1:
            data_dict.traj_seq_images = self.preprocess_images(
                data_dict.traj_seq_images
            )
        data_dict.traj_seq = (
            data_dict.traj_seq_states if self.use_states
            else data_dict.traj_seq_images
        )

        if "start_ind" not in data_dict:
            data_dict.start_ind = 0
        if "end_ind" not in data_dict:
            data_dict.end_ind = self.max_seq_len - 1
        if "pad_mask" not in data_dict:
            data_dict.pad_mask = np.ones(self.max_seq_len, dtype=np.float32)

        data_dict.I_0 = data_dict.traj_seq[0]
        data_dict.I_g = data_dict.traj_seq[data_dict.end_ind]
        if "traj_seq_images" in data_dict:
            data_dict.I_0_image = data_dict.traj_seq_images[0]
            data_dict.I_g_image = data_dict.traj_seq_images[data_dict.end_ind]
            if not self.use_states:
                # identical to traj_seq; don't ship the batch twice
                del data_dict["traj_seq_images"]
        return data_dict

    def preprocess_images(self, images: np.ndarray) -> np.ndarray:
        """uint8 NHWC at img_sz (data_loader.py:213-224 resizes + normalizes
        on host; here normalization to [-1, 1] happens on device —
        core.metrics.to_float_images — so batches cross the host->device
        link at 1/4 the bytes)."""
        if images.ndim == 5:
            images = images[:, 0]  # camera axis
        assert images.dtype == np.uint8, "images must be uint8"
        return resize_video(images, (self.img_sz, self.img_sz))

    @staticmethod
    def get_dataset_spec(data_dir):
        """Load `dataset_spec.py` next to the data (gcp_builder.py:149-163)."""
        import importlib.util

        path = os.path.join(data_dir, "dataset_spec.py")
        spec = importlib.util.spec_from_file_location("dataset_spec", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return AttrDict(mod.dataset_spec)


class VarLenVideoDataset(BaseVideoDataset):
    """h5 variable-length trajectories with random max_seq_len windows
    (data_loader.py:105-261)."""

    def __init__(self, data_dir, mpar, data_conf, phase, shuffle=True,
                 dataset_size=-1):
        super().__init__(data_dir, mpar, data_conf, phase, shuffle, dataset_size)
        self.filenames = self._get_filenames()
        self.traj_per_file = self._get_traj_per_file(self.filenames[0])
        self.ram_cache = mpar.get("ram_cache", True)
        self._cache = {}

    def _get_filenames(self):
        raise NotImplementedError

    @staticmethod
    def _shuffle_with_seed(arr, seed=2):
        rng = random.Random()
        rng.seed(seed)
        rng.shuffle(arr)
        return arr

    def _get_traj_per_file(self, path):
        with h5py.File(path, "r") as f:
            return int(f["traj_per_file"][()])

    def __len__(self):
        full = len(self.filenames) * self.traj_per_file
        if self.dataset_size != -1:
            return min(self.dataset_size, full)
        return full

    def _load_traj(self, index) -> AttrDict:
        """Raw trajectory arrays, RAM-cached after first access.

        The cache stores images already camera-selected and resized to img_sz
        (uint8), so steady-state epochs touch neither disk nor cv2 — on a
        single-core host the input pipeline otherwise starves the TPU. A
        2.5k-trajectory nav dataset caches in ~3 GB. Disable with model param
        `ram_cache=False` for datasets larger than host RAM.
        """
        cached = self._cache.get(index) if self.ram_cache else None
        if cached is None:
            path = self.filenames[index // self.traj_per_file]
            try:
                with h5py.File(path, "r") as f:
                    key = f"traj{index % self.traj_per_file}"
                    cached = AttrDict()
                    if self.load_h5_images and key + "/images" in f:
                        imgs = f[key + "/images"][()]
                        if imgs.ndim == 5:
                            imgs = imgs[:, 0]  # camera axis
                        cached.images = resize_video(
                            imgs, (self.img_sz, self.img_sz))
                    for name in ["states", "actions", "pad_mask"]:
                        if key + "/" + name in f:
                            cached[name] = f[key + "/" + name][()].astype(
                                np.float32)
            except Exception as e:
                raise ValueError(f"Problem loading file {path}: {e}") from e
            if self.ram_cache:
                self._cache[index] = cached
        # fresh AttrDict: downstream pops/renames keys (arrays are not mutated)
        return AttrDict(cached)

    def __getitem__(self, index) -> AttrDict:
        data_dict = self._load_traj(index)
        end_ind = int(np.argmax(
            data_dict.pad_mask
            * np.arange(data_dict.pad_mask.shape[0], dtype=np.float32)
        ))
        start_ind = (
            self._rng.randint(0, max(end_ind - 1, 1))
            if self.randomize_start else 0
        )
        start_ind, end_ind, data_dict = self._sample_max_len_video(
            data_dict, start_ind, end_ind
        )
        if self.randomize_length:
            end_ind = self._randomize_length(start_ind, end_ind, data_dict)
        data_dict.end_ind = end_ind
        data_dict.start_ind = start_ind
        return self.process_data_dict(data_dict)

    def _sample_max_len_video(self, data_dict, start_ind, end_ind):
        """Random max_seq_len window at train time; pad/crop to fixed length
        (data_loader.py:175-189)."""
        target = self.max_seq_len
        extra = (end_ind - start_ind + 1) - target
        if self.phase == "train":
            offset = max(0, int(self._rng.rand() * (extra + 1))) + start_ind
        else:
            offset = 0

        def maybe_pad(val):
            val = val[offset:]
            n = val.shape[0]
            if n > target:
                return val[:target]
            if n < target:
                pad = np.zeros((target - n,) + val.shape[1:], dtype=val.dtype)
                return np.concatenate([val, pad], 0)
            return val

        data_dict = AttrDict({k: maybe_pad(v) for k, v in data_dict.items()})
        if "actions" in data_dict:
            data_dict.actions = data_dict.actions[:-1]
        end_ind = min(end_ind - offset, target - 1)
        return 0, end_ind, data_dict

    def _randomize_length(self, start_ind, end_ind, data_dict):
        """Uniform random length in [3, end] with random chop
        (data_loader.py:191-211)."""
        length = 3 + int(self._rng.rand() * (end_ind - 2))
        chop = int(self._rng.rand() * (end_ind + 1 - length))
        end_ind = length - 1
        t = self.max_seq_len
        pad_mask = np.logical_and(
            np.arange(t) <= end_ind, np.arange(t) >= start_ind
        ).astype(np.float32)

        def chop_pad(arr):
            arr = np.concatenate(
                [arr[chop:], np.repeat(arr[-1:], chop, 0)], 0
            )
            arr[end_ind + 1:] = 0
            return arr

        for key in [k for k in data_dict if k != "pad_mask"]:
            data_dict[key] = chop_pad(data_dict[key])
        data_dict.pad_mask = pad_mask
        return end_ind


class FolderSplitVarLenVideoDataset(VarLenVideoDataset):
    """train/val/test by directory: {data_dir}/hdf5/{phase}/*
    (data_loader.py:264-272)."""

    def _get_filenames(self):
        filenames = sorted(
            glob.glob(os.path.join(self.data_dir, "hdf5", self.phase, "*"))
        )
        if not filenames:
            raise RuntimeError(f"no files in {self.data_dir}/hdf5/{self.phase}")
        return self._shuffle_with_seed(filenames)


class GlobalSplitVarLenVideoDataset(VarLenVideoDataset):
    """train/val/test by global percentage split (data_loader.py:275-289)."""

    def _get_filenames(self):
        filenames = []
        for root, _, files in os.walk(self.data_dir):
            for f in files:
                if f.endswith(".h5") and f != "dataset_info.h5":
                    filenames.append(os.path.join(root, f))
        if not filenames:
            raise RuntimeError(f"no h5 files under {self.data_dir}")
        filenames = self._shuffle_with_seed(filenames)
        frac = self.spec["split"]
        phases = ["train", "val", "test"]
        bounds = np.cumsum([0] + [frac[p] for p in phases])
        i = phases.index(self.phase)
        lo = int(len(filenames) * bounds[i])
        hi = int(len(filenames) * bounds[i + 1])
        return filenames[lo:hi]


class MazeGlobalSplitVarLenVideoDataset(GlobalSplitVarLenVideoDataset):
    """Keeps only (x, y) position states (data_loader.py:292-296)."""

    def process_data_dict(self, data_dict):
        if "states" in data_dict:
            data_dict["states"] = data_dict["states"][..., :2]
        return super().process_data_dict(data_dict)


class MazeTopRenderedGlobalSplitVarLenVideoDataset(
    MazeGlobalSplitVarLenVideoDataset
):
    """Replaces stored images with top-down renders cropped around the agent
    (data_loader.py:299-319): for each frame, the (x, y) state is rendered
    into the static maze overview with the goal marked, through the same
    renderer the TopdownMultiroom2dEnv uses at control time — so train and
    test observations match exactly."""

    def __init__(self, data_dir, mpar, data_conf, phase, shuffle=True,
                 dataset_size=-1):
        from video_gcp_tpu.planning.infra.envs.multiroom2d import Multiroom2dEnv

        super().__init__(data_dir, mpar, data_conf, phase, shuffle, dataset_size)
        assert "n_rooms" in data_conf, "need n_rooms in dataset config"
        self.load_h5_images = False  # observations are re-rendered below
        self._crop_window_px = data_conf["crop_window"]
        self._render_env = Multiroom2dEnv(
            {"n_rooms": data_conf["n_rooms"]}, no_env=True,
            crop_window=self._crop_window_px,
        )
        # rendered frames keyed by the windowed state path: the render is a
        # pure function of (states[:end+1], crop_window), so caching on a
        # content hash is correct even under randomized windows/lengths and
        # makes steady-state epochs skip the renderer entirely (the single
        # biggest t_data cost on a 1-core host feeding a TPU).
        # LRU-bounded: under randomized train windows almost every epoch
        # inserts fresh keys (~1.2 GB/epoch at published 9-room scale), which
        # unbounded grew to an OOM kill at epoch ~168 of a 200-epoch run —
        # val windows are deterministic and keep hitting within the cap
        import collections

        self._render_cache = collections.OrderedDict()
        self._render_cache_bytes = 0
        self._render_cache_cap = int(
            float(os.environ.get("GCP_RENDER_CACHE_MB", "2048")) * 1e6)

    def process_data_dict(self, data_dict):
        assert "states" in data_dict and "end_ind" in data_dict
        end = data_dict["end_ind"]
        cache_key = None
        rendered = None
        if self.ram_cache:
            path = np.ascontiguousarray(
                data_dict["states"][: end + 1, :2], dtype=np.float32)
            cache_key = (int(end), hashlib.md5(path.tobytes()).hexdigest())
            rendered = self._render_cache.get(cache_key)
            if rendered is not None:
                self._render_cache.move_to_end(cache_key)
        if rendered is None:
            w = self._crop_window_px
            raw = np.zeros(
                (data_dict["states"].shape[0], 1, w * 2, w * 2, 3),
                dtype=np.uint8,
            )
            self._render_env.render_traj_top_down_u8(
                data_dict["states"][: end + 1],
                data_dict["states"][end, :2],
                raw[: end + 1, 0],
            )
            # resize to model resolution before caching (smaller cache; the
            # base-class resize is then a no-op)
            rendered = self.preprocess_images(raw)
            if cache_key is not None:
                self._render_cache[cache_key] = rendered
                self._render_cache_bytes += rendered.nbytes
                while (self._render_cache_bytes > self._render_cache_cap
                       and len(self._render_cache) > 1):
                    _, old = self._render_cache.popitem(last=False)
                    self._render_cache_bytes -= old.nbytes
        data_dict["images"] = rendered
        return super().process_data_dict(data_dict)


class RandomVideoDataset(BaseVideoDataset):
    """Synthetic point-mass-in-a-room video dataset.

    Resurrects the reference's intended-but-missing `RandomVideoDataset`
    fixture (gcp_builder.py:106-108 references a module that does not exist).
    Deterministic per index: a dot moves along a random piecewise-linear path;
    frames render the dot on a dark background. Gives real learning signal for
    CPU-runnable end-to-end micro-training (SURVEY.md §4 test plan (b,c)).
    """

    def __init__(self, data_dir, mpar, data_conf, phase, shuffle=True,
                 dataset_size=256):
        super().__init__(data_dir, mpar, data_conf, phase, shuffle, dataset_size)
        if "max_seq_len" not in self.spec:
            self.spec["max_seq_len"] = mpar.get("max_seq_len", 20)
        self.n_seqs = dataset_size if dataset_size != -1 else 256
        self.phase_seed = {"train": 0, "val": 10_000_000, "test": 20_000_000}[phase]

    def __len__(self):
        return self.n_seqs

    def __getitem__(self, index) -> AttrDict:
        rng = np.random.RandomState(self.phase_seed + index)
        t = self.max_seq_len
        length = rng.randint(max(t // 2, 4), t + 1)

        # piecewise-linear waypoint path in [0.15, 0.85]^2
        n_way = rng.randint(2, 5)
        way = rng.rand(n_way, 2) * 0.7 + 0.15
        seg = np.linspace(0, n_way - 1, length)
        lo = np.floor(seg).astype(int)
        frac = (seg - lo)[:, None]
        hi = np.minimum(lo + 1, n_way - 1)
        states = way[lo] * (1 - frac) + way[hi] * frac  # [length, 2]

        imgs = np.zeros((t, self.img_sz, self.img_sz, 3), dtype=np.uint8)
        yy, xx = np.mgrid[0 : self.img_sz, 0 : self.img_sz]
        for i in range(length):
            cx, cy = states[i] * self.img_sz
            blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * (self.img_sz / 12) ** 2))
            imgs[i, :, :, 0] = (blob * 255).astype(np.uint8)
            imgs[i, :, :, 1] = ((1 - blob) * 60).astype(np.uint8)

        pad_mask = np.zeros(t, dtype=np.float32)
        pad_mask[:length] = 1.0
        full_states = np.zeros((t, 2), dtype=np.float32)
        full_states[:length] = states
        actions = np.zeros((t - 1, 2), dtype=np.float32)
        actions[: length - 1] = np.diff(full_states[:length], axis=0)

        data_dict = AttrDict(
            images=imgs, states=full_states, actions=actions, pad_mask=pad_mask,
            end_ind=length - 1, start_ind=0,
        )
        return self.process_data_dict(data_dict)
