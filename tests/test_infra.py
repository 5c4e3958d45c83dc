"""Planning-infra tests: layout determinism, env stepping/collision, PRM
navigation, saver round-trip, control-perf metrics."""
import os
import pickle

import numpy as np
import pytest

from video_gcp_tpu.core import AttrDict


class TestLayout:
    def test_layout_deterministic(self):
        from video_gcp_tpu.planning.infra.envs.layout import define_layout

        l1 = define_layout(3)
        l2 = define_layout(3)
        assert l1.doors == l2.doors
        np.testing.assert_array_equal(l1.ox, l2.ox)

    def test_room_seq_bfs(self):
        from video_gcp_tpu.planning.infra.envs.layout import (
            define_layout,
            plan_room_seq,
        )

        lay = define_layout(3)
        seq = plan_room_seq(0, 8, lay.doors)
        assert seq[0] == 0 and seq[-1] == 8
        # consecutive rooms must share a door
        for a, b in zip(seq[:-1], seq[1:]):
            assert sorted((a, b)) in [sorted(d) for d in lay.doors]

    def test_sampler_stays_in_room(self):
        from video_gcp_tpu.planning.infra.envs.layout import (
            RoomSampler2d,
            define_layout,
        )

        lay = define_layout(3)
        s = RoomSampler2d(3)
        for room in range(9):
            for _ in range(10):
                p = s.sample(room)
                assert lay.coords2ridx(p[0], p[1]) == room


class TestEnv:
    def test_reset_step_contract(self):
        from video_gcp_tpu.planning.infra.envs.multiroom2d import (
            TopdownMultiroom2dEnv,
        )

        env = TopdownMultiroom2dEnv(dict(n_rooms=9, crop_window=32))
        obs, reset_state = env.reset()
        assert obs.images.shape == (1, 64, 64, 3)
        assert obs.images.dtype == np.uint8
        assert obs.state.shape == (5,)
        obs2 = env.step(np.array([0.01, 0.0]))
        assert obs2.qpos_full[0] != obs.qpos_full[0]

    def test_wall_collision_blocks(self):
        from video_gcp_tpu.planning.infra.envs.multiroom2d import Multiroom2dEnv

        env = Multiroom2dEnv(dict(n_rooms=9))
        env.reset(np.array([0.0, 0.0, 0.0, 0.4, 0.4]))
        # dash straight through the world; collisions must keep us in bounds
        for _ in range(30):
            env.step(np.array([0.1, 0.0]))
        assert np.abs(env.current_pos[:2]).max() < env._layout.table_size / 2


class TestPrmNavigation:
    def test_expert_reaches_goal(self):
        np.random.seed(3)
        from video_gcp_tpu.planning.infra.envs.multiroom2d import (
            TopdownMultiroom2dEnv,
        )
        from video_gcp_tpu.planning.infra.policy.prm_policy.prm_policy import (
            PrmPolicy,
        )

        env = TopdownMultiroom2dEnv(dict(n_rooms=9, crop_window=32))
        obs, _ = env.reset()
        policy = PrmPolicy(None, dict(n_samples_per_room=60,
                                      max_traj_length=120), None, None,
                           **env.env_policy_params())
        qpos, goal = [obs.qpos_full], [obs.goal]
        for t in range(100):
            out = policy.act(t=t, i_tr=0, qpos_full=np.stack(qpos),
                             goal=np.stack(goal))
            obs = env.step(out.actions)
            qpos.append(obs.qpos_full)
            goal.append(obs.goal)
        stats = env.eval()
        assert stats["final_dist"] < 0.15, stats


class TestSavers:
    def test_hdf5_roundtrip(self, tmp_path):
        from video_gcp_tpu.data.datasets import GlobalSplitVarLenVideoDataset
        from video_gcp_tpu.planning.infra.agent.savers import HDF5Saver

        t_max = 10
        saver = HDF5Saver(str(tmp_path), {}, dict(T=t_max), traj_per_file=2,
                          split_train_val_test=False)
        for i in range(2):
            length = 6 + i
            obs = dict(
                images=np.random.randint(0, 255, (length + 1, 1, 8, 8, 3),
                                         dtype=np.uint8),
                state=np.random.rand(length + 1, 5),
            )
            pol = [dict(actions=np.random.rand(2)) for _ in range(length)]
            saver.save_traj(i, {}, obs, pol)
        saver.flush()

        data_conf = AttrDict(dataset_spec=AttrDict(
            max_seq_len=t_max, split=AttrDict(train=1.0, val=0.0, test=0.0)
        ))
        ds = GlobalSplitVarLenVideoDataset(
            str(tmp_path), dict(use_convs=True, img_sz=8), data_conf, "train"
        )
        ex = ds[0]
        assert ex.traj_seq.shape == (t_max, 8, 8, 3)
        assert ex.end_ind in (6, 7)


class TestControlPerf:
    def test_metrics_from_fake_scores(self, tmp_path):
        from video_gcp_tpu.evaluation.compute_control_perf import (
            compute_control_perf,
        )

        # agent walks from (-0.4,-0.4) to (0.4,0.4): success
        traj = np.linspace([-0.4, -0.4, 0], [0.4, 0.4, 0], 20)
        data = dict(
            full_traj=[traj],
            reset_state=[dict(goal=np.array([0.4, 0.4]))],
        )
        res = compute_control_perf(data, n_rooms=9, max_seq_len=100)
        assert res["success_rate"] == 1.0
        assert res["penalized_cost"] < 100
        # failure case pays max_seq_len
        data2 = dict(
            full_traj=[traj[:2]],
            reset_state=[dict(goal=np.array([0.4, 0.4]))],
        )
        res2 = compute_control_perf(data2, n_rooms=9, max_seq_len=100)
        assert res2["success_rate"] == 0.0
        assert res2["penalized_cost"] == 100


class TestTopDownRenderFastPath:
    def test_u8_traj_render_matches_float_renderer(self):
        """The dataset re-render path (render_traj_top_down_u8) must be
        pixel-identical (up to the [0,1]->255 rounding) to the float
        renderer the env uses at control time, so train and test
        observations stay matched (multiroom3d_env.py:150-219)."""
        from video_gcp_tpu.planning.infra.envs.multiroom2d import (
            Multiroom2dEnv,
        )

        env = Multiroom2dEnv({"n_rooms": 9}, no_env=True, crop_window=40)
        rng = np.random.RandomState(3)
        ts = env._layout.table_size
        states = rng.uniform(-0.45 * ts, 0.45 * ts, (11, 2))
        out = np.zeros((11, 80, 80, 3), np.uint8)
        env.render_traj_top_down_u8(states, states[-1], out)
        for t in range(11):
            ref = np.asarray(
                env.render_pos_top_down(states[t], states[-1]) * 255,
                np.uint8,
            )
            assert np.abs(ref.astype(int) - out[t].astype(int)).max() <= 1

    def test_maze_dataset_skips_stored_images(self, tmp_path):
        """MazeTopRendered... re-renders from states; the h5 image read must
        be skipped entirely (load_h5_images False)."""
        import h5py

        from video_gcp_tpu.core.attrdict import AttrDict
        from video_gcp_tpu.data.datasets import (
            MazeTopRenderedGlobalSplitVarLenVideoDataset,
        )

        t = 12
        d = tmp_path / "hdf5" / "train"
        d.mkdir(parents=True)
        with h5py.File(d / "traj_0.h5", "w") as f:
            f.create_dataset("traj_per_file", data=1)
            f.create_dataset("traj0/images",
                             data=np.zeros((t, 1, 16, 16, 3), np.uint8))
            f.create_dataset(
                "traj0/states",
                data=np.tile(np.linspace(-0.3, 0.3, t)[:, None], (1, 5)),
            )
            f.create_dataset("traj0/actions", data=np.zeros((t - 1, 2)))
            f.create_dataset("traj0/pad_mask", data=np.ones(t))
        data_conf = AttrDict(
            dataset_spec=AttrDict(max_seq_len=t,
                                  split=AttrDict(train=1.0, val=0.0, test=0.0)),
            n_rooms=9,
            crop_window=40,
        )
        ds = MazeTopRenderedGlobalSplitVarLenVideoDataset(
            str(tmp_path), dict(use_convs=True, img_sz=16), data_conf, "train"
        )
        ex = ds[0]
        assert ex.traj_seq.shape == (t, 16, 16, 3)
        # stored images are all-zero; re-rendered frames must not be
        assert np.asarray(ex.traj_seq).std() > 0.01
        assert "images" not in ds._cache.get(0, {})

        # the render is a pure function of the windowed state path: the
        # second epoch must hit the content-hash render cache, not re-draw
        calls = []
        orig = ds._render_env.render_traj_top_down_u8
        ds._render_env.render_traj_top_down_u8 = (
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
        )
        ex2 = ds[0]
        assert not calls, "cached render path must skip the renderer"
        np.testing.assert_array_equal(np.asarray(ex2.traj_seq),
                                      np.asarray(ex.traj_seq))

    def test_render_cache_lru_bound(self, tmp_path, monkeypatch):
        """Randomized train windows insert fresh cache keys nearly every epoch
        (~1.2 GB/epoch at published scale — unbounded, this OOM-killed a
        200-epoch run); the cache must evict oldest entries past the byte cap
        while still hitting on the most recent key."""
        import h5py

        from video_gcp_tpu.core.attrdict import AttrDict
        from video_gcp_tpu.data.datasets import (
            MazeTopRenderedGlobalSplitVarLenVideoDataset,
        )

        monkeypatch.setenv("GCP_RENDER_CACHE_MB", "0.01")  # 10 kB cap
        t = 12
        d = tmp_path / "hdf5" / "train"
        d.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(4):
            with h5py.File(d / f"traj_{i}.h5", "w") as f:
                f.create_dataset("traj_per_file", data=1)
                f.create_dataset("traj0/images",
                                 data=np.zeros((t, 1, 16, 16, 3), np.uint8))
                f.create_dataset("traj0/states",
                                 data=rng.uniform(-0.3, 0.3, (t, 5)))
                f.create_dataset("traj0/actions", data=np.zeros((t - 1, 2)))
                f.create_dataset("traj0/pad_mask", data=np.ones(t))
        data_conf = AttrDict(
            dataset_spec=AttrDict(max_seq_len=t,
                                  split=AttrDict(train=1.0, val=0.0, test=0.0)),
            n_rooms=9,
            crop_window=40,
        )
        ds = MazeTopRenderedGlobalSplitVarLenVideoDataset(
            str(tmp_path), dict(use_convs=True, img_sz=16), data_conf, "train"
        )
        for i in range(4):
            ds[i]
        assert ds._render_cache_bytes <= ds._render_cache_cap + ds[3].traj_seq.nbytes
        assert len(ds._render_cache) < 4, "old entries must be evicted"
        # bytes accounting must match the surviving entries exactly
        assert ds._render_cache_bytes == sum(
            v.nbytes for v in ds._render_cache.values())
        # the most recent entry still hits
        calls = []
        orig = ds._render_env.render_traj_top_down_u8
        ds._render_env.render_traj_top_down_u8 = (
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
        )
        ds[3]
        assert not calls, "most recent entry must remain cached"


class TestFirstPersonView:
    """Egocentric raycast renderer (fpv.py) — the reference's miniworld
    camera mode without OpenGL (multiroom3d_env.py:85-99)."""

    def _renderer(self, sz=48):
        from video_gcp_tpu.planning.infra.envs.fpv import FirstPersonRenderer

        return FirstPersonRenderer(3, img_size=sz)

    def test_render_shape_and_determinism(self):
        r = self._renderer()
        img1 = r.render((0.0, 0.0), 0.3)
        img2 = r.render((0.0, 0.0), 0.3)
        assert img1.shape == (48, 48, 3) and img1.dtype == np.uint8
        np.testing.assert_array_equal(img1, img2)
        assert img1.std() > 5  # walls/floor/ceiling actually drawn

    def test_walls_grow_when_approaching(self):
        """Perspective: walking toward the east wall makes the center
        column's wall slice taller."""
        r = self._renderer()

        def center_wall_rows(x):
            perp, _, _ = r.cast((x, 0.0), 0.0)
            return perp[r.img_size // 2]

        d_far, d_near = center_wall_rows(0.0), center_wall_rows(0.4)
        assert d_near < d_far  # closer to the east boundary wall

    def test_rays_hit_boundary_at_known_distance(self):
        """Looking east from the center of the (centered) 3x3 maze, the
        center ray must hit a wall at most at the boundary (0.5) and at
        least at the first interior grid line (1/6)."""
        r = self._renderer()
        perp, _, _ = r.cast((0.0, 0.0), 0.0)
        d = perp[r.img_size // 2]
        assert 1 / 6 - 1e-6 <= d <= 0.5 + 1e-6

    def test_goal_billboard_visible_and_occludable(self):
        r = self._renderer()
        base = r.render((0.0, 0.0), 0.0)
        ahead = r.render((0.0, 0.0), 0.0, goal=(0.12, 0.0))
        behind = r.render((0.0, 0.0), 0.0, goal=(-0.12, 0.0))
        red = r.GOAL_COLOR * 255
        def has_goal(img):
            return (np.abs(img.astype(int) - red.astype(int)).sum(-1) < 30).any()
        assert has_goal(ahead)
        assert not has_goal(behind)
        assert not has_goal(base)

    def test_egocentric_env_obs(self):
        from video_gcp_tpu.core.attrdict import AttrDict
        from video_gcp_tpu.planning.infra.envs.multiroom2d import (
            EgocentricMultiroom2dEnv,
        )

        np.random.seed(0)
        env = EgocentricMultiroom2dEnv(
            {"n_rooms": 9, "fpv_img_size": 32}, no_env=True)
        obs, _ = env.reset()
        assert obs.images.shape == (1, 32, 32, 3)
        assert obs.images.dtype == np.uint8
        obs2 = env.step(np.array([0.02, 0.0]))
        assert obs2.images.shape == (1, 32, 32, 3)
        # moving the agent changes the egocentric view
        assert not np.array_equal(obs.images, obs2.images)

    def test_textured_render(self):
        """Miniworld-style textured mode: deterministic, distinct from the
        flat-color render, with real texel variation inside wall, floor and
        ceiling regions (procedural fallback — no PNG pack in this env)."""
        from video_gcp_tpu.planning.infra.envs.fpv import (
            FirstPersonRenderer,
            procedural_texture,
        )

        # procedural tiles are deterministic and name-distinct
        t1 = procedural_texture("brick_wall_1.png")
        t2 = procedural_texture("wood_1.png")
        np.testing.assert_array_equal(t1, procedural_texture("brick_wall_1.png"))
        assert np.abs(t1 - t2).mean() > 0.01

        flat = FirstPersonRenderer(3, img_size=48)
        tex = FirstPersonRenderer(3, img_size=48, textures="procedural")
        pos, heading = (0.05, -0.1), 0.7
        img_f = flat.render(pos, heading)
        img_t = tex.render(pos, heading)
        assert img_t.shape == img_f.shape and img_t.dtype == np.uint8
        np.testing.assert_array_equal(img_t, tex.render(pos, heading))
        assert np.abs(img_t.astype(int) - img_f.astype(int)).mean() > 3

        # ceiling (top rows) and floor (bottom rows) carry texture detail,
        # not the flat path's smooth gradient
        assert img_t[:6].std(axis=(0, 1)).mean() > img_f[:6].std(axis=(0, 1)).mean()
        assert img_t[-6:].std(axis=(0, 1)).mean() > img_f[-6:].std(axis=(0, 1)).mean()

    def test_textured_pack_mode_requires_assets(self):
        from video_gcp_tpu.planning.infra.envs.fpv import FirstPersonRenderer

        with pytest.raises(FileNotFoundError):
            FirstPersonRenderer(3, img_size=32, textures="pack",
                                texture_dir="/nonexistent")

    def test_textured_env_obs(self):
        from video_gcp_tpu.planning.infra.envs.multiroom2d import (
            EgocentricMultiroom2dEnv,
        )

        np.random.seed(0)
        env = EgocentricMultiroom2dEnv(
            {"n_rooms": 9, "fpv_img_size": 32, "fpv_textures": "procedural"},
            no_env=True)
        obs, _ = env.reset()
        assert obs.images.shape == (1, 32, 32, 3)
        assert obs.images.dtype == np.uint8
