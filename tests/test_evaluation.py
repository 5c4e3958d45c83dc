"""Evaluator protocol tests: top-of-N selection, eval bindings, dumps, FVD/LPIPS."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_gcp_tpu.core import AttrDict


class TestEvalBindings:
    def _tree_outputs(self, b=2, depth=3, t=8, img=8):
        rng = np.random.RandomState(0)
        n = 2 ** depth - 1
        outputs = AttrDict(
            tree=AttrDict(
                images=jnp.asarray(rng.rand(b, n, img, img, 3).astype(np.float32))
            ),
            end_ind=jnp.array([t - 1, t - 3]),
            prune_keep=jnp.asarray(rng.rand(b, n) > 0.3),
        )
        inputs = AttrDict(
            traj_seq=jnp.asarray(rng.rand(b, t, img, img, 3).astype(np.float32)),
            end_ind=outputs.end_ind,
        )
        return outputs, inputs

    @pytest.mark.parametrize("scheme", ["dtw", "basic", "pruned_dtw"])
    def test_tree_schemes_shapes(self, scheme):
        from video_gcp_tpu.evaluation.eval_binding import tree_dense_sample

        outputs, inputs = self._tree_outputs()
        gen = tree_dense_sample(outputs, inputs, scheme, 8)
        assert gen.shape == inputs.traj_seq.shape

    @pytest.mark.parametrize("scheme", ["greedy_exist", "greedy_l2"])
    def test_greedy_schemes_shapes(self, scheme):
        from video_gcp_tpu.evaluation.eval_binding import tree_dense_sample

        outputs, inputs = self._tree_outputs()
        rng = np.random.RandomState(1)
        outputs.existence_logits = jnp.asarray(
            rng.randn(2, outputs.tree.images.shape[1]).astype(np.float32))
        gen = tree_dense_sample(outputs, inputs, scheme, 8)
        assert gen.shape == inputs.traj_seq.shape
        # every emitted frame is one of the tree's node images
        nodes = np.array(outputs.tree.images).reshape(2, -1, 8 * 8 * 3)
        flat = np.array(gen).reshape(2, 8, 8 * 8 * 3)
        for b in range(2):
            for t in range(8):
                d = np.abs(nodes[b] - flat[b, t]).max(axis=1)
                assert d.min() < 1e-6

    def test_greedy_exist_requires_existence_logits(self):
        from video_gcp_tpu.evaluation.eval_binding import tree_dense_sample

        outputs, inputs = self._tree_outputs()
        with pytest.raises(ValueError, match="existence"):
            tree_dense_sample(outputs, inputs, "greedy_exist", 8)

    def test_greedy_exist_select_matches_host_priority_queue(self):
        """The batched frontier argmax must pop nodes in exactly the order of
        the reference's host-side PriorityQueue (evaluation_matching.py:48-70:
        pop max-p node, push its children)."""
        import heapq

        from video_gcp_tpu.evaluation.eval_binding import greedy_exist_select

        rng = np.random.RandomState(3)
        b, depth, t = 3, 4, 10
        n = 2 ** depth - 1
        p = rng.rand(b, n).astype(np.float32)
        end_ind = np.array([t - 1, 4, 0])

        sel = np.array(greedy_exist_select(jnp.asarray(p), jnp.asarray(end_ind), t))
        for bi in range(b):
            want = np.zeros(n, bool)
            heap = [(-p[bi, 0], 0)]
            for _ in range(int(end_ind[bi]) + 1):
                if not heap:
                    break
                _, node = heapq.heappop(heap)
                want[node] = True
                for c in (2 * node + 1, 2 * node + 2):
                    if c < n:
                        heapq.heappush(heap, (-p[bi, c], c))
            np.testing.assert_array_equal(sel[bi], want)

    def test_greedy_l2_match_matches_host_recursion(self):
        """Level-batched segment matching must equal the per-example host
        recursion it replaces (each node claims the min-cost frame in its
        segment, children recurse into the left/right remainders)."""
        from video_gcp_tpu.evaluation.eval_binding import greedy_l2_match

        rng = np.random.RandomState(7)
        b, depth, t = 3, 4, 11
        n = 2 ** depth - 1
        cost = rng.rand(b, n, t).astype(np.float32)
        end_ind = np.array([t - 1, 6, 0])

        match_t, valid = map(np.array, greedy_l2_match(
            jnp.asarray(cost), jnp.asarray(end_ind), depth))

        for bi in range(b):
            want_m = np.zeros(n, np.int64)
            want_v = np.zeros(n, bool)

            def rec(node, lo, hi):
                if node >= n or lo > hi:
                    return
                m = lo + int(np.argmin(cost[bi, node, lo:hi + 1]))
                want_m[node], want_v[node] = m, True
                rec(2 * node + 1, lo, m - 1)
                rec(2 * node + 2, m + 1, hi)

            rec(0, 0, int(end_ind[bi]))
            np.testing.assert_array_equal(valid[bi], want_v)
            np.testing.assert_array_equal(match_t[bi][want_v], want_m[want_v])

    def test_basic_scheme_picks_matched_nodes(self):
        """With end=T-1 and a deep-enough tree, each frame gets the node whose
        balanced timestep truncates to it."""
        from video_gcp_tpu.evaluation.eval_binding import tree_dense_sample
        from video_gcp_tpu.models.binding import balanced_match_dists

        outputs, inputs = self._tree_outputs(b=1, depth=4, t=8)
        gen = tree_dense_sample(outputs, inputs, "basic", 8)
        w = balanced_match_dists(4, inputs.end_ind[:1], 8)
        for t in range(8):
            col = np.array(w[0, :, t])
            if col.sum() > 0:
                node = col.argmax()
                np.testing.assert_allclose(
                    np.array(gen[0, t]), np.array(outputs.tree.images[0, node])
                )


class TestEvaluatorProtocol:
    def test_top_of_n_keeps_best(self, tmp_path):
        """The evaluator must keep the best sample per example by mse."""
        from video_gcp_tpu.evaluation.evaluator import Evaluator

        b, t, img = 2, 6, 8
        rng = np.random.RandomState(0)
        traj = rng.rand(b, t, img, img, 3).astype(np.float32) * 2 - 1
        inputs = AttrDict(
            traj_seq=jnp.asarray(traj),
            pad_mask=jnp.ones((b, t), jnp.float32),
            end_ind=jnp.array([t - 1, t - 1]),
            start_ind=jnp.zeros((b,), jnp.int32),
        )

        class FakeModel:
            """Returns GT + noise scaled by the sample rng — sample quality
            varies so top-of-N must pick the least-noisy one."""

            def apply(self, params, inp, phase, mode, pred_length,
                      rngs=None):
                key = rngs["sample"]
                scale = jax.random.uniform(key, ()) * 0.5
                noise = jax.random.normal(key, inp.traj_seq.shape) * scale
                return AttrDict(
                    dense_rec=AttrDict(images=inp.traj_seq + noise)
                )

        ev = Evaluator(FakeModel(), str(tmp_path), {}, max_seq_len=t,
                       pruning_scheme="basic", top_of_100=True)
        ev._top_of = 10
        result = ev.eval(None, inputs, jax.random.PRNGKey(0))
        buf = result.metrics
        best = buf.mse.min(axis=1)
        # best_gen must correspond to the per-example min mse
        assert np.all(buf.mse.min(axis=1) <= buf.mse.mean(axis=1))
        summary = ev.dump_results(0)
        np.testing.assert_allclose(summary["mse"], best.mean(), rtol=1e-5)
        # dumps exist, channel-first layout
        gen = np.load(os.path.join(str(tmp_path), "metrics", "gen_images_0.npy"))
        assert gen.shape == (b, t - 1, 3, img, img)


class TestFVDLPIPS:
    def test_fvd_zero_for_identical(self, tmp_path):
        from video_gcp_tpu.evaluation.fvd import compute_fvd

        rng = np.random.RandomState(0)
        seqs = rng.rand(8, 5, 3, 8, 8).astype(np.float32)
        gt, gen = tmp_path / "gt.npy", tmp_path / "gen.npy"
        np.save(gt, seqs)
        np.save(gen, seqs)
        assert abs(compute_fvd(str(gt), str(gen))) < 1e-3

    def test_fvd_positive_for_different(self, tmp_path):
        from video_gcp_tpu.evaluation.fvd import compute_fvd

        rng = np.random.RandomState(0)
        a = rng.rand(8, 5, 3, 8, 8).astype(np.float32)
        b = rng.rand(8, 5, 3, 8, 8).astype(np.float32) * 0.2 - 0.9
        np.save(tmp_path / "gt.npy", a)
        np.save(tmp_path / "gen.npy", b)
        assert compute_fvd(str(tmp_path / "gt.npy"),
                           str(tmp_path / "gen.npy")) > 0.01

    def test_lpips_ordering(self, tmp_path):
        from video_gcp_tpu.evaluation.lpips import compute_lpips

        rng = np.random.RandomState(0)
        a = rng.rand(4, 5, 3, 8, 8).astype(np.float32)
        near = a + rng.randn(*a.shape).astype(np.float32) * 0.01
        far = rng.rand(4, 5, 3, 8, 8).astype(np.float32)
        np.save(tmp_path / "gt.npy", a)
        np.save(tmp_path / "near.npy", near)
        np.save(tmp_path / "far.npy", far)
        d_near = compute_lpips(str(tmp_path / "gt.npy"), str(tmp_path / "near.npy"))
        d_far = compute_lpips(str(tmp_path / "gt.npy"), str(tmp_path / "far.npy"))
        assert d_near < d_far

    def test_black_frame_length_detection(self):
        from video_gcp_tpu.evaluation.fvd import detect_lengths

        seqs = np.zeros((2, 6, 3, 4, 4))
        seqs[0, :4] = 1.0
        seqs[1, :6] = 0.5
        np.testing.assert_array_equal(detect_lengths(seqs), [4, 6])


class TestRealEmbeddingPaths:
    """I3D / AlexNet weight-loading paths, validated with synthetic
    checkpoints of the exact published tensor layouts."""

    def test_frechet_analytic_fixture(self):
        from video_gcp_tpu.evaluation.fvd import frechet_distance

        # exact moments: mu_a=(1,1), mu_b=(4,1), equal covariances -> d^2 = 9
        a = np.array([[0, 0], [0, 2], [2, 0], [2, 2]], np.float64)
        b = a + np.array([3.0, 0.0])
        assert abs(frechet_distance(a, b) - 9.0) < 1e-6

    def test_i3d_checkpoint_roundtrip(self, tmp_path):
        import torch

        from video_gcp_tpu.evaluation.fvd import (
            _i3d_logits,
            i3d_param_shapes,
            load_i3d_params,
        )

        rng = np.random.RandomState(0)
        sd = {}
        for name, shape in i3d_param_shapes().items():
            if name.endswith("running_var") or name.endswith("bn.weight"):
                arr = np.ones(shape, np.float32)
            elif name.endswith("running_mean") or name.endswith("bn.bias") \
                    or name.endswith("conv3d.bias"):
                arr = np.zeros(shape, np.float32)
            else:  # He-scaled conv kernels keep the net input-sensitive
                fan_in = int(np.prod(shape[1:]))
                arr = rng.randn(*shape).astype(np.float32) / np.sqrt(fan_in)
            sd[name] = torch.from_numpy(arr)
        path = str(tmp_path / "i3d_rgb.pt")
        torch.save(sd, path)

        params = load_i3d_params(path)
        vids = jnp.asarray(rng.rand(1, 8, 64, 64, 3).astype(np.float32))
        logits = np.asarray(_i3d_logits(params, vids))
        assert logits.shape == (1, 400)
        assert np.isfinite(logits).all()
        # deterministic + input-sensitive
        logits2 = np.asarray(_i3d_logits(params, vids))
        np.testing.assert_array_equal(logits, logits2)
        other = np.asarray(_i3d_logits(params, vids * 0.5))
        assert np.abs(other - logits).max() > 0

    def test_alexnet_lpips_checkpoint_roundtrip(self, tmp_path):
        import torch

        from video_gcp_tpu.evaluation.lpips import (
            _ALEXNET_CONVS,
            alexnet_feature_fn,
            lpips_distance,
        )

        rng = np.random.RandomState(0)
        sd, in_ch = {}, 3
        conv_idx = [0, 3, 6, 8, 10]
        for i, (out_ch, k, _, _) in enumerate(_ALEXNET_CONVS):
            sd[f"features.{conv_idx[i]}.weight"] = torch.from_numpy(
                rng.randn(out_ch, in_ch, k, k).astype(np.float32) * 0.05)
            sd[f"features.{conv_idx[i]}.bias"] = torch.zeros(out_ch)
            sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
                np.abs(rng.randn(1, out_ch, 1, 1)).astype(np.float32))
            in_ch = out_ch
        path = str(tmp_path / "alex_lpips.pth")
        torch.save(sd, path)

        fn = alexnet_feature_fn(path)
        assert fn.lins is not None and len(fn.lins) == 5
        a = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
        d_same = lpips_distance(a, a.copy(), fn)
        d_diff = lpips_distance(a, -a, fn)
        assert np.allclose(d_same, 0.0, atol=1e-5)
        assert (d_diff > d_same + 1e-4).all()

    def test_env_fallback_is_proxy(self, monkeypatch):
        from video_gcp_tpu.evaluation import fvd, lpips

        monkeypatch.delenv(fvd.I3D_WEIGHTS_ENV, raising=False)
        monkeypatch.delenv(lpips.LPIPS_WEIGHTS_ENV, raising=False)
        assert fvd.default_embed_fn()[1] == "random-proxy"
        assert lpips.default_feature_fn()[1] == "random-proxy"


class TestEvalLoggers:
    def test_file_logger_writes_metrics_and_images(self, tmp_path):
        from video_gcp_tpu.evaluation.eval_logger import FileEvalLogger

        lg = FileEvalLogger(str(tmp_path))
        vals = np.random.rand(4, 10)
        best = vals.min(1)
        lg.log_metric("mse", vals, best, it=3)
        assert "mean mse" in (tmp_path / "metrics_3.txt").read_text()
        lg.log_image(np.zeros((8, 8, 3), np.float32), "gt_vs_best", 0, 3)
        assert (tmp_path / "gt_vs_best" / "it_3" / "gt_vs_best_0.png").exists()
        lg.log_array(np.arange(5), "raw", 3)
        assert (tmp_path / "raw" / "it_3" / "raw.npy").exists()

    def test_tb_logger_forwards_to_training_logger(self, tmp_path):
        from video_gcp_tpu.evaluation.eval_logger import TBEvalLogger

        calls = []

        class FakeTB:
            def log_scalar(self, v, name, step, phase=""):
                calls.append(("scalar", name))

            def log_images(self, im, name, step, phase=""):
                calls.append(("image", name))

            def log_video(self, im, name, step, phase=""):
                calls.append(("video", name))

        lg = TBEvalLogger(str(tmp_path), FakeTB())
        vals = np.random.rand(4, 10)
        lg.log_metric("psnr", vals, vals.max(1), it=7)
        lg.log_image(np.zeros((8, 8, 3), np.float32), "gt_vs_best", 1, 7)
        lg.log_gif(np.zeros((3, 8, 8, 3), np.float32), "best_gen", 1, 7)
        names = [n for _, n in calls]
        assert "eval/metric/psnr/top10_mean" in names
        assert "eval/gt_vs_best/1" in names
        assert "eval/best_gen/1" in names
