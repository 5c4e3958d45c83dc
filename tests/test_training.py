"""End-to-end micro-training + checkpoint/resume + multi-device dryrun
(SURVEY.md §4 test plan (c, d))."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture()
def exp_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("GCP_EXP_DIR", str(tmp_path))
    return tmp_path


class TestEndToEndTraining:
    def test_micro_train_and_resume(self, exp_dir):
        from video_gcp_tpu.training.trainer import ModelTrainer, parse_args

        conf = os.path.join(REPO, "experiments/prediction/toy_random/gcp_tree")
        args = parse_args(["--path", conf, "--log_outputs_interval", "32",
                           "--resume", "none"])
        trainer = ModelTrainer(args)
        trainer.conf["num_epochs"] = 1
        trainer.run()

        # checkpoint written
        from video_gcp_tpu.training import checkpoint as ckpt

        eps = ckpt.get_epochs(trainer.exp_path)
        assert eps == [0]

        # resume restores step counter
        args2 = parse_args(["--path", conf, "--resume", "latest"])
        trainer2 = ModelTrainer(args2)
        assert int(trainer2.state.step) == int(trainer.state.step)
        assert trainer2.start_epoch == 1

        # loss finite and training moved it
        batch = next(iter(trainer.val_loader))
        import jax

        losses = jax.device_get(
            trainer.val_step(trainer.state, batch, jax.random.PRNGKey(0))
        )
        assert np.isfinite(float(losses["total"]))

    def test_train_deadline_stops_at_epoch_boundary(self, exp_dir, capsys):
        """--train_deadline in the past: run() returns cleanly without
        training any further epoch (the queue relies on the rc-0 stop to
        drain instead of being killed mid-train)."""
        from video_gcp_tpu.training import checkpoint as ckpt
        from video_gcp_tpu.training.trainer import ModelTrainer, parse_args

        conf = os.path.join(REPO, "experiments/prediction/toy_random/gcp_tree")
        args = parse_args(["--path", conf, "--resume", "none",
                           "--train_deadline", "1.0"])  # epoch 1970: always past
        trainer = ModelTrainer(args)
        trainer.conf["num_epochs"] = 3
        trainer.run()
        assert ckpt.get_epochs(trainer.exp_path) == []  # stopped before ep0
        assert "train_deadline reached" in capsys.readouterr().out


class TestDataLoader:
    class _ToyDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32)}

    def test_serial_and_pool_paths_equivalent(self):
        """num_workers clamps to the host core count (GIL: threaded example
        assembly loses on few-core boxes); serial and pooled producers must
        yield identical batch streams."""
        from video_gcp_tpu.data.loader import DataLoader

        def collect(workers):
            dl = DataLoader(self._ToyDS(), batch_size=4, shuffle=True,
                            num_workers=workers, seed=3, n_repeat=2,
                            drop_last=True)
            return [np.asarray(b["x"]) for b in dl]

        a = collect(1)
        dl4 = DataLoader(self._ToyDS(), batch_size=4, num_workers=4, seed=3,
                         n_repeat=2)
        assert dl4.num_workers >= 1  # clamped, never zero
        b = [np.asarray(x["x"]) for x in dl4]
        assert len(a) == len(b) == len(dl4) == 5  # 10*2 // 4
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


NPZ_PATH = os.path.join(
    REPO, "experiments/prediction/9room/gcp_tree/pretrained_ep74.npz")
CONF_9ROOM = os.path.join(REPO, "experiments/prediction/9room/gcp_tree")


class TestPretrainedNpz:
    """Programmatic restore of the shipped flat-npz checkpoint
    (PRETRAINED.md; format = flattened train state minus optimizer)."""

    def test_npz_structure_matches_model(self, tmp_path, monkeypatch):
        """load_pretrained_npz rebuilds exactly the current 9-room model's
        param tree (catches conf/model drift vs the shipped artifact)."""
        import jax
        import jax.numpy as jnp

        from video_gcp_tpu.core.attrdict import AttrDict
        from video_gcp_tpu.models.hyperparameters import default_hparams
        from video_gcp_tpu.training import checkpoint as ckpt
        from video_gcp_tpu.training.config import load_config

        data_dir = tmp_path / "nav_9rooms"
        data_dir.mkdir()
        (data_dir / "dataset_spec.py").write_text(
            "dataset_spec = dict(max_seq_len=100, state_dim=2, n_actions=2)\n")
        monkeypatch.setenv("GCP_DATA_DIR", str(tmp_path))

        loaded = ckpt.load_pretrained_npz(NPZ_PATH)
        assert "params" in loaded  # flax collection level

        bundle = load_config(CONF_9ROOM)
        hp = default_hparams()
        mc = dict(bundle.model_config)
        mc.setdefault("batch_size", 2)
        known = {k: v for k, v in mc.items() if k in hp}
        unknown = {k: v for k, v in mc.items() if k not in hp}
        hp.override(known)
        hp.overwrite(unknown)
        hp["batch_size"] = 2
        model = bundle.configuration["model"](hp=dict(hp))

        b, t, sz = 2, hp["max_seq_len"], hp["img_sz"]
        batch = AttrDict(
            traj_seq=jnp.zeros((b, t, sz, sz, 3), jnp.float32),
            pad_mask=jnp.ones((b, t), jnp.float32),
            end_ind=jnp.full((b,), t - 1, jnp.int32),
            start_ind=jnp.zeros((b,), jnp.int32),
            I_0=jnp.zeros((b, sz, sz, 3), jnp.float32),
            I_g=jnp.zeros((b, sz, sz, 3), jnp.float32),
            traj_seq_states=jnp.zeros((b, t, 2), jnp.float32),
            actions=jnp.zeros((b, t, 2), jnp.float32),
        )
        key = jax.random.PRNGKey(0)
        template = jax.eval_shape(
            lambda bt: model.init({"params": key, "sample": key}, bt,
                                  "train", "posterior"), batch)
        # tree_map raises on any structure mismatch; also pin shapes
        def check(tpl, arr):
            assert tuple(tpl.shape) == tuple(arr.shape), (tpl.shape, arr.shape)

        jax.tree_util.tree_map(check, template, loaded)

    @pytest.mark.skipif(
        not os.path.isfile("/root/data/nav_9rooms/dataset_spec.py"),
        reason="real 9-room dataset not present")
    def test_restored_psnr_pinned(self, monkeypatch, tmp_path):
        """--resume <npz> seeds trainer.state.params; one prior-sample val
        batch lands within 1.5 dB of the committed single-sample PSNR (~12.5;
        top-of-100 12.60) — measures the fp16 round-trip too."""
        import jax

        from video_gcp_tpu.training.trainer import ModelTrainer, parse_args

        monkeypatch.setenv("GCP_DATA_DIR", "/root/data")
        monkeypatch.setenv("GCP_EXP_DIR", str(tmp_path))
        args = parse_args(["--path", CONF_9ROOM, "--resume", NPZ_PATH,
                           "--deterministic", "1", "--train", "0"])
        trainer = ModelTrainer(args)
        assert trainer.start_epoch == 0  # params-only restore
        batch = next(iter(trainer.val_loader))
        acc = {"psnr": [], "ssim": [], "mse": []}
        trainer._quick_image_metrics(batch, jax.random.PRNGKey(0), acc)
        assert acc["psnr"], "no image metrics produced"
        psnr_val = float(np.mean(acc["psnr"]))
        assert 11.0 < psnr_val < 14.0, psnr_val


class TestMultiDevice:
    def test_dryrun_8_devices(self):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    @pytest.mark.skipif(os.environ.get("GCP_RUN_SLOW") != "1",
                        reason="flagship-scale FSDP dryrun (GCP_RUN_SLOW=1)")
    def test_flagship_fsdp_dryrun(self):
        """25-room flagship shapes (L=8 untied, split_linear 512x3 LSTM)
        through one dp x fsdp sharded step on the virtual mesh."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        import __graft_entry__ as g

        g.dryrun_flagship_fsdp(8)

    def test_batch_sharding_spreads_data(self):
        import jax
        import jax.numpy as jnp

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from video_gcp_tpu.parallel.mesh import batch_sharding, make_mesh

        mesh = make_mesh(8)
        x = jnp.zeros((16, 4))
        xs = jax.device_put(x, batch_sharding(mesh))
        assert len(xs.sharding.device_set) == 8

    def test_param_shardings_rules(self):
        """FSDP sharding rule: large divisible arrays shard their largest
        divisible dim over 'model'; small/indivisible arrays replicate."""
        import jax
        import jax.numpy as jnp

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from video_gcp_tpu.parallel.mesh import make_mesh, param_shardings

        mesh = make_mesh(8, ("data", "model"), (2, 4))
        tree = {
            "big": jnp.zeros((256, 512)),       # shards dim 1 (largest)
            "small": jnp.zeros((8, 8)),          # below threshold
            "odd": jnp.zeros((3, 33333)),        # no dim divisible by 4
            "scalar": jnp.zeros(()),
        }
        shd = param_shardings(mesh, tree)
        assert shd["big"].spec == jax.sharding.PartitionSpec(None, "model")
        assert shd["small"].is_fully_replicated
        assert shd["odd"].is_fully_replicated
        assert shd["scalar"].is_fully_replicated

        # a sharded device_put actually spreads bytes over the model axis
        xs = jax.device_put(tree["big"], shd["big"])
        assert len(xs.sharding.device_set) == 8  # 4 model shards x 2 data replicas


class TestDownloadData:
    def test_file_url_roundtrip(self, tmp_path, monkeypatch):
        """download_data fetches + unzips an archive on first use
        (utils.py:79-93); exercised against a local file:// fixture."""
        import io
        import zipfile

        from video_gcp_tpu.training import config as cfg

        archive = tmp_path / "nav_test.zip"
        with zipfile.ZipFile(archive, "w") as z:
            z.writestr("nav_test/traj_0.h5", b"h5-bytes")
            z.writestr("nav_test/dataset_spec.py",
                       "dataset_spec = dict(max_seq_len=4)\n")
        data_dir = tmp_path / "data"
        monkeypatch.setenv("GCP_DATA_DIR", str(data_dir))
        monkeypatch.setitem(cfg.DATASET_URLS, "nav_test",
                            archive.as_uri())
        cfg.download_data("nav_test")
        assert (data_dir / "nav_test" / "traj_0.h5").read_bytes() == b"h5-bytes"
        # second call is a no-op (dataset dir exists)
        cfg.download_data("nav_test")

    def test_unknown_dataset_raises(self, tmp_path, monkeypatch):
        from video_gcp_tpu.training import config as cfg

        monkeypatch.setenv("GCP_DATA_DIR", str(tmp_path / "d"))
        with pytest.raises(ValueError, match="not known"):
            cfg.download_data("no_such_dataset")


class TestDatasetValSweep:
    """--dataset_val_sweep across datasets with different horizons
    (reference train.py:71-99 run_dataset_val_sweep). Regression: the
    round-3 hardware sweep validated zero batches (val split smaller than
    one batch + drop_last) and crashed on the horizon-sized length-predictor
    head before the shape-filtered restore existed."""

    @staticmethod
    def _make_ds(root, name, t, n_trajs=10):
        import h5py

        d = root / name
        d.mkdir(parents=True)
        # val split (4 examples) deliberately smaller than the batch size
        # (5): the sweep must keep the short batch, not drop it
        (d / "dataset_spec.py").write_text(
            f"dataset_spec = dict(max_seq_len={t}, state_dim=2, n_actions=2,"
            f" split=dict(train=0.6, val=0.4, test=0.0))\n"
        )
        rng = np.random.RandomState(0)
        for i in range(n_trajs):
            with h5py.File(d / f"traj_{i}.h5", "w") as f:
                f.create_dataset("traj_per_file", data=1)
                f.create_dataset(
                    "traj0/images",
                    data=rng.randint(0, 255, (t, 1, 16, 16, 3), np.uint8),
                )
                f.create_dataset("traj0/states",
                                 data=rng.rand(t, 2).astype(np.float32))
                f.create_dataset("traj0/actions",
                                 data=rng.rand(t - 1, 2).astype(np.float32))
                f.create_dataset("traj0/pad_mask", data=np.ones(t))

    def test_cross_horizon_sweep(self, tmp_path, monkeypatch, capsys):
        from video_gcp_tpu.training.trainer import ModelTrainer, parse_args

        data_root = tmp_path / "data"
        self._make_ds(data_root, "sweep_a", 16)
        self._make_ds(data_root, "sweep_b", 8)
        monkeypatch.setenv("GCP_DATA_DIR", str(data_root))
        monkeypatch.setenv("GCP_EXP_DIR", str(tmp_path / "exp"))

        conf_dir = tmp_path / "conf"
        conf_dir.mkdir()
        (conf_dir / "conf.py").write_text(
            "from video_gcp_tpu.core.attrdict import AttrDict\n"
            "from experiments.prediction.base_configs import gcp_tree as b\n"
            "configuration = AttrDict(b.configuration)\n"
            "configuration.update(dict(\n"
            "    dataset_name='sweep_a', batch_size=5, lr=1e-3,\n"
            "    dataset_sweep_specs=[\n"
            "        dict(dataset_name='sweep_a', max_seq_len=16),\n"
            "        dict(dataset_name='sweep_b', max_seq_len=8),\n"
            "    ],\n"
            "))\n"
            "model_config = AttrDict(b.model_config)\n"
            "model_config.update(dict(hierarchy_levels=4, img_sz=16, ngf=8,\n"
            "    nz_mid_lstm=48, nz_vae=8, regress_length=True))\n"
            "model_config.pop('add_weighted_pixel_copy')\n"
        )
        args = parse_args(["--path", str(conf_dir), "--resume", "none"])
        trainer = ModelTrainer(args)
        trainer.run_dataset_val_sweep()
        out = capsys.readouterr().out
        # both specs validated with a real short (4 < batch 5) val batch
        assert "[dataset sweep] sweep_a (T=16, L=4)" in out
        assert "[dataset sweep] sweep_b (T=8, L=3)" in out
        assert out.count("nll") >= 2, out
        # horizon-dependent length-predictor head stays fresh at T=8 only
        assert out.count("kept fresh") == 1, out
        assert "length_pred" in out


class TestPretrainedNpzExport:
    def test_save_load_roundtrip(self, tmp_path):
        """save_pretrained_npz -> load_pretrained_npz returns the same tree
        (float32 leaves fp16-quantized, ints untouched)."""
        from video_gcp_tpu.training import checkpoint as ckpt

        params = {"params": {
            "enc": {"kernel": np.linspace(0, 1, 12, dtype=np.float32)
                    .reshape(3, 4),
                    "bias": np.zeros(4, np.float32)},
            "steps": np.arange(5, dtype=np.int32),
        }}
        path = tmp_path / "pre.npz"
        ckpt.save_pretrained_npz(str(path), params, step=7)
        loaded = ckpt.load_pretrained_npz(str(path))
        assert set(loaded) == {"params"}
        np.testing.assert_allclose(
            loaded["params"]["enc"]["kernel"],
            params["params"]["enc"]["kernel"], atol=1e-3)
        assert loaded["params"]["enc"]["kernel"].dtype == np.float32
        np.testing.assert_array_equal(loaded["params"]["steps"],
                                      params["params"]["steps"])

    def test_shipped_npz_matches_format(self):
        """The committed pretrained_ep74.npz parses as the documented format."""
        from video_gcp_tpu.training import checkpoint as ckpt

        loaded = ckpt.load_pretrained_npz(NPZ_PATH)
        assert "params" in loaded  # flax collection level
