"""Tests for the real-FVD/LPIPS machinery: the torch-free zip-checkpoint
reader (core/torch_ckpt.py) golden-checked against torch's own writer, and
the JAX I3D / AlexNet-LPIPS graphs end-to-end from synthetic torch
checkpoints — the full GCP_I3D_WEIGHTS / GCP_LPIPS_WEIGHTS path minus only
the real weight values (ref: gcp/evaluation/fvd/compute_fvd.py:27-88,
lpips/compute_lpips.py:18-62)."""
import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

torch = pytest.importorskip("torch")


class TestTorchCkptReader:
    def _roundtrip(self, tensors, tmp_path):
        from video_gcp_tpu.core.torch_ckpt import load_state_dict

        path = str(tmp_path / "ckpt.pth")
        torch.save(tensors, path)
        return load_state_dict(path)

    def test_dtypes_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        sd = {
            "f32": torch.from_numpy(rng.randn(3, 4).astype(np.float32)),
            "f64": torch.from_numpy(rng.randn(2, 5)),
            "f16": torch.from_numpy(rng.randn(4, 4).astype(np.float16)),
            "i64": torch.from_numpy(rng.randint(-9, 9, (7,))),
            "i32": torch.from_numpy(
                rng.randint(-9, 9, (2, 3)).astype(np.int32)),
            "u8": torch.from_numpy(
                rng.randint(0, 255, (5,)).astype(np.uint8)),
            "bool": torch.from_numpy(rng.rand(6) > 0.5),
            "scalar": torch.tensor(3.25),
        }
        out = self._roundtrip(sd, tmp_path)
        assert set(out) == set(sd)
        for k, t in sd.items():
            np.testing.assert_array_equal(out[k], t.numpy(), err_msg=k)

    def test_strided_views(self, tmp_path):
        """Views share one storage: offsets + non-unit strides must be
        honored by _rebuild_tensor (stride-tricks reconstruction)."""
        base = torch.arange(24, dtype=torch.float32)
        sd = {
            "offset_view": base[5:17].view(3, 4),      # storage offset 5
            "transposed": base.view(4, 6).t(),          # non-contiguous
            "strided": base[::2],                       # step-2 stride
            "full": base.view(2, 3, 4),
        }
        out = self._roundtrip(sd, tmp_path)
        for k, t in sd.items():
            np.testing.assert_array_equal(out[k], t.numpy(), err_msg=k)

    def test_bfloat16(self, tmp_path):
        import ml_dtypes

        t = torch.arange(8, dtype=torch.float32).to(torch.bfloat16)
        out = self._roundtrip({"bf16": t}, tmp_path)
        assert out["bf16"].dtype == np.dtype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(
            out["bf16"].astype(np.float32), t.to(torch.float32).numpy())

    def test_rejects_non_tensor_globals(self, tmp_path):
        """weights_only behavior: any pickle global outside the tensor set
        raises instead of executing arbitrary constructors."""
        import collections

        from video_gcp_tpu.core.torch_ckpt import load_state_dict

        path = str(tmp_path / "evil.pth")
        torch.save({"bad": collections.Counter([1, 2])}, path)
        with pytest.raises(pickle.UnpicklingError, match="refusing to load"):
            load_state_dict(path)

    def test_rejects_legacy_format(self, tmp_path):
        from video_gcp_tpu.core.torch_ckpt import load_state_dict

        path = str(tmp_path / "legacy.pth")
        torch.save({"x": torch.zeros(2)}, path,
                   _use_new_zipfile_serialization=False)
        with pytest.raises(pickle.UnpicklingError, match="not a torch zip"):
            load_state_dict(path)


def _synthetic_i3d_ckpt(path: str, seed: int = 0) -> None:
    from video_gcp_tpu.evaluation.fvd import i3d_param_shapes

    rng = np.random.RandomState(seed)
    sd = {}
    for name, shape in i3d_param_shapes().items():
        if name.endswith("running_var"):
            arr = (1.0 + 0.1 * rng.rand(*shape)).astype(np.float32)
        elif name.endswith("bn.weight"):
            # unit-scale gammas: tiny gammas compound over ~20 units and
            # collapse the signal to the bias constant
            arr = (1.0 + 0.05 * rng.randn(*shape)).astype(np.float32)
        elif "conv3d.weight" in name:
            fan_in = int(np.prod(shape[1:]))
            arr = (rng.randn(*shape) / np.sqrt(fan_in)).astype(np.float32)
        else:
            arr = (0.05 * rng.randn(*shape)).astype(np.float32)
        sd[name] = torch.from_numpy(arr)
    torch.save(sd, path)


class TestI3DGraph:
    def test_embed_fn_end_to_end(self, tmp_path):
        """GCP_I3D_WEIGHTS path: synthetic pytorch-i3d checkpoint -> torch-free
        read -> BN fold -> jax graph -> [B, 400] Kinetics logits."""
        from video_gcp_tpu.evaluation.fvd import i3d_embed_fn

        path = str(tmp_path / "i3d.pth")
        _synthetic_i3d_ckpt(path)
        embed = i3d_embed_fn(path)
        videos = np.random.RandomState(1).randint(
            0, 255, (2, 4, 16, 16, 3)).astype(np.float32)
        feats = embed(videos)
        assert feats.shape == (2, 400)
        assert np.isfinite(feats).all()
        # embeddings must distinguish inputs (graph isn't constant/collapsed)
        assert np.abs(feats[0] - feats[1]).max() > 0

    def test_bn_folding(self, tmp_path):
        """Folded scale/shift reproduce torch BatchNorm3d eval-mode math."""
        from video_gcp_tpu.evaluation.fvd import load_i3d_params

        path = str(tmp_path / "i3d.pth")
        _synthetic_i3d_ckpt(path)
        params = load_i3d_params(path)
        from video_gcp_tpu.core.torch_ckpt import load_state_dict

        sd = load_state_dict(path)
        name = "Conv3d_1a_7x7"
        x = np.random.RandomState(2).randn(11).astype(np.float32)
        gamma, beta = sd[f"{name}.bn.weight"], sd[f"{name}.bn.bias"]
        mean, var = sd[f"{name}.bn.running_mean"], sd[f"{name}.bn.running_var"]
        want = (x[:, None] - mean) / np.sqrt(var + 1e-3) * gamma + beta
        got = (x[:, None] * params[f"{name}.bn.scale"]
               + params[f"{name}.bn.shift"])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _synthetic_alexnet_ckpt(path: str, with_lins: bool, seed: int = 0) -> None:
    rng = np.random.RandomState(seed)
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3),
             (256, 256, 3)]
    sd = {}
    for idx, (cin, cout, k) in zip([0, 3, 6, 8, 10], chans):
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            (rng.randn(cout, cin, k, k) * 0.05).astype(np.float32))
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            np.zeros(cout, np.float32))
    if with_lins:
        for i, c in enumerate([64, 192, 384, 256, 256]):
            sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
                rng.rand(1, c, 1, 1).astype(np.float32))
    torch.save(sd, path)


class TestAlexNetLPIPS:
    def test_feature_fn_and_distance(self, tmp_path):
        """GCP_LPIPS_WEIGHTS path: synthetic torchvision-layout checkpoint ->
        5 relu feature maps (+ lin head) -> per-image LPIPS distances."""
        from video_gcp_tpu.evaluation.lpips import (
            alexnet_feature_fn,
            lpips_distance,
        )

        path = str(tmp_path / "alexnet.pth")
        _synthetic_alexnet_ckpt(path, with_lins=True)
        fn = alexnet_feature_fn(path)
        x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32) \
            * 2 - 1
        feats = fn(x)
        assert len(feats) == 5
        assert feats[0].shape[0] == 2 and feats[0].shape[-1] == 64
        assert fn.lins is not None and len(fn.lins) == 5
        d_self = lpips_distance(x, x, feature_fn=fn)
        d_other = lpips_distance(x, -x, feature_fn=fn)
        assert d_self.shape == (2,)
        np.testing.assert_allclose(d_self, 0.0, atol=1e-6)
        assert (d_other > d_self).all()

    def test_backbone_only(self, tmp_path):
        from video_gcp_tpu.evaluation.lpips import alexnet_feature_fn

        path = str(tmp_path / "alexnet.pth")
        _synthetic_alexnet_ckpt(path, with_lins=False)
        fn = alexnet_feature_fn(path)
        assert fn.lins is None
