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


class TestMultiDevice:
    def test_dryrun_8_devices(self):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        import __graft_entry__ as g

        g.dryrun_multichip(8)

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
