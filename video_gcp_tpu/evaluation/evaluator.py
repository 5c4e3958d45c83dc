"""Top-of-100 evaluation protocol, device-batched.

Reference: gcp/evaluation/compute_metrics.py:49-393. The model is re-run
`top_of` times per val batch with prior sampling; per sample, the prediction is
aligned to the GT timeline via the configured pruning scheme, the first/last
(conditioning) frames are cropped, PSNR/SSIM/MSE are computed, and the best
sample per sequence (by `top_comp_metric`, default mse) is kept. Dumps:
metrics txt (CSV line: best mean/std + per-sample std, compute_metrics.py:
184-195), .npy sequence files in the reference's channel-first layout (so the
reference FVD/LPIPS offline tools consume them unchanged), and gif strips.

TPU design: each sample is ONE jitted batched forward + metric computation on
device (the reference loops batch elements in Python and runs per-sequence
Cython DTW); only per-sample scalars and the current best frames come back to
host.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.metrics import mse, psnr, ssim
from video_gcp_tpu.evaluation.eval_binding import dense_sample
from video_gcp_tpu.ops.tree_index import breadthfirst2depthfirst

LOWER_IS_BETTER = ["mse"]
HIGHER_IS_BETTER = ["psnr", "ssim"]


def _host_float_images(x: np.ndarray) -> np.ndarray:
    """Host-side twin of core.metrics.to_float_images (uint8 batches)."""
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 127.5 - 1.0
    return x


class Evaluator:
    N_PLOTTED_ELEMENTS = 5

    def __init__(self, model, logdir: str, hp, max_seq_len: int,
                 pruning_scheme: str = "dtw", top_of_100: bool = True,
                 top_comp_metric: str = "mse", use_images: bool = True,
                 eval_logger=None):
        self.model = model
        self._logdir = os.path.join(logdir, "metrics")
        os.makedirs(self._logdir, exist_ok=True)
        if eval_logger is None:
            from video_gcp_tpu.evaluation.eval_logger import FileEvalLogger

            eval_logger = FileEvalLogger(self._logdir)
        self._eval_logger = eval_logger
        self._pruning_scheme = pruning_scheme
        self._top_of = 100 if top_of_100 else 1
        self._metric = top_comp_metric
        self._max_seq_len = max_seq_len
        self._use_images = use_images
        self.full_evaluation = None

        scheme = pruning_scheme

        def eval_sample(params, inputs, rng):
            from video_gcp_tpu.core.metrics import to_float_images

            inputs = AttrDict(inputs)
            inputs.traj_seq = to_float_images(inputs.traj_seq)
            out = model.apply(params, inputs, "test", "prior", False,
                              rngs={"sample": rng})
            gen = dense_sample(out, inputs, scheme, max_seq_len)
            t = inputs.traj_seq.shape[1]
            t_idx = jnp.arange(t)[None, :]
            # crop first and last (conditioning) frames; mask padded frames
            valid = (
                (t_idx >= 1)
                & (t_idx <= inputs.end_ind[:, None] - 1)
                & (inputs.pad_mask > 0)
            )
            denom = jnp.maximum(valid.sum(1), 1)
            m = AttrDict()
            if use_images:
                m.mse = (mse(gen, inputs.traj_seq) * valid).sum(1) / denom
                m.psnr = (psnr(gen, inputs.traj_seq) * valid).sum(1) / denom
                m.ssim = (ssim(gen, inputs.traj_seq) * valid).sum(1) / denom
            else:
                # state-space sequences [B, T, D]: per-frame vector MSE (the
                # image metrics reduce the trailing 3 axes and would collapse
                # the batch axis here)
                err = jnp.mean((gen - inputs.traj_seq) ** 2, axis=-1)
                m.mse = (err * valid).sum(1) / denom
            full_gen = (
                breadthfirst2depthfirst(out.tree.images)
                if "tree" in out else gen
            )
            return m, gen, full_gen

        self._eval_sample = jax.jit(eval_sample)

        lower_better = top_comp_metric in LOWER_IS_BETTER

        def eval_chunk(params, inputs, rng, n):
            """Scan n samples in ONE dispatch, tracking the best on device —
            the reference re-runs the model in a Python loop per sample
            (compute_metrics.py:135-138); on a remote-TPU setup each dispatch
            costs tunnel RTT, so the scan collapses 100 round-trips."""

            def step(carry, k):
                best_val, best_gen, best_full = carry
                m, gen, full = eval_sample(params, inputs, k)
                crit = m[top_comp_metric]
                better = crit < best_val if lower_better else crit > best_val
                bexp = better.reshape((-1,) + (1,) * (gen.ndim - 1))
                best_gen = jnp.where(bexp, gen, best_gen)
                bexp_f = better.reshape((-1,) + (1,) * (full.ndim - 1))
                best_full = jnp.where(bexp_f, full, best_full)
                best_val = jnp.where(better, crit, best_val)
                return (best_val, best_gen, best_full), m

            b = inputs.traj_seq.shape[0]
            init_val = jnp.full(
                (b,), jnp.inf if lower_better else -jnp.inf
            )
            shapes = jax.eval_shape(eval_sample, params, inputs, rng)
            gen0 = jnp.zeros(shapes[1].shape, shapes[1].dtype)
            full0 = jnp.zeros(shapes[2].shape, shapes[2].dtype)
            keys = jax.random.split(rng, n)
            carry, metrics = jax.lax.scan(step, (init_val, gen0, full0), keys)
            return carry, metrics

        self._eval_chunk = jax.jit(eval_chunk, static_argnames="n")

    # ------------------------------------------------------------------

    CHUNK = 20  # samples per device dispatch

    def eval(self, params, inputs, rng) -> AttrDict:
        """Run the protocol on one batch; returns per-example best metrics."""
        b = inputs.traj_seq.shape[0]
        n = self._top_of
        lower = self._metric in LOWER_IS_BETTER
        buf = None
        best_val = best_gen = best_full = None

        s = 0
        while s < n:
            k = min(self.CHUNK, n - s)
            (bv, bg, bf), ms = self._eval_chunk(
                params, inputs, jax.random.fold_in(rng, s), k
            )
            ms = jax.device_get(ms)  # dict of [k, B]
            if buf is None:
                buf = AttrDict({key: [] for key in ms})
            for key in ms:
                buf[key].append(np.asarray(ms[key]).T)  # -> [B, k]
            # np.array (not asarray): device_get can hand back read-only
            # views on the TPU path, and best_val is updated in place below
            bv = np.array(jax.device_get(bv))
            if best_val is None:
                best_val = bv
                best_gen = np.array(jax.device_get(bg))
                best_full = np.array(jax.device_get(bf))
            else:
                better = bv < best_val if lower else bv > best_val
                if better.any():
                    bg = np.asarray(jax.device_get(bg))
                    bf = np.asarray(jax.device_get(bf))
                    best_gen[better] = bg[better]
                    best_full[better] = bf[better]
                    best_val[better] = bv[better]
            s += k
        buf = AttrDict({key: np.concatenate(v, 1) for key, v in buf.items()})

        # a handful of single prior samples for qualitative dumps
        rand_seqs = []
        for s_i in range(min(self.N_PLOTTED_ELEMENTS, n)):
            _, gen, _ = self._eval_sample(
                params, inputs, jax.random.fold_in(rng, 10_000 + s_i)
            )
            rand_seqs.append(np.asarray(jax.device_get(gen)))

        result = AttrDict(
            metrics=buf,
            best_gen=best_gen,
            best_full=best_full,
            gt_seq=_host_float_images(
                np.asarray(jax.device_get(inputs.traj_seq))
            ),
            end_ind=np.asarray(jax.device_get(inputs.end_ind)),
            rand_seqs=rand_seqs,
        )
        self._accumulate(result)
        return result

    def _accumulate(self, result):
        if self.full_evaluation is None:
            self.full_evaluation = AttrDict(
                metrics=AttrDict({k: [v] for k, v in result.metrics.items()}),
                best_gen=[result.best_gen],
                best_full=[result.best_full],
                gt_seq=[result.gt_seq],
                rand_seqs=[result.rand_seqs],
            )
        else:
            for k, v in result.metrics.items():
                self.full_evaluation.metrics[k].append(v)
            self.full_evaluation.best_gen.append(result.best_gen)
            self.full_evaluation.best_full.append(result.best_full)
            self.full_evaluation.gt_seq.append(result.gt_seq)
            self.full_evaluation.rand_seqs.append(result.rand_seqs)

    def reset(self):
        self.full_evaluation = None

    # ------------------------------------------------------------------

    def dump_results(self, it: int) -> dict:
        summary = self.dump_metrics(it)
        if self._use_images:
            self.dump_seqs(it)
        self.reset()
        return summary

    def dump_metrics(self, it: int) -> dict:
        """Best-sample mean/std + per-sample std, CSV line + txt file
        (compute_metrics.py:184-195)."""
        metrics = {
            k: np.concatenate(v, 0)
            for k, v in self.full_evaluation.metrics.items()
        }
        if self._metric in LOWER_IS_BETTER:
            best_idx = np.argmin(metrics[self._metric], axis=1)
        else:
            best_idx = np.argmax(metrics[self._metric], axis=1)
        print_st = []
        summary = {}
        lines = []
        for name in sorted(metrics):
            vals = metrics[name]
            best = vals[np.arange(vals.shape[0]), best_idx]
            print_st.extend([best.mean(), best.std(), vals.std(axis=1).mean()])
            summary[name] = float(best.mean())
            lines.append(
                f"{name}: best_mean {best.mean():.6f} best_std {best.std():.6f} "
                f"sample_std {vals.std(axis=1).mean():.6f}"
            )
            self._eval_logger.log_metric(
                name, vals if self._top_of > 1 else None, best, it
            )
        print(*print_st, sep=",")
        with open(os.path.join(self._logdir, f"results_{it}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        return summary

    def dump_seqs(self, it: int):
        """.npy dumps in the reference layout [B, T, C, H, W] (channel-first)
        so compute_fvd / compute_lpips read them unchanged
        (compute_metrics.py:199-226)."""
        gt = np.concatenate(self.full_evaluation.gt_seq, 0)[:, 1:]
        gen = np.concatenate(self.full_evaluation.best_gen, 0)[:, 1:]
        full = np.concatenate(self.full_evaluation.best_full, 0)

        def to_cf(x):
            return np.transpose(x, (0, 1, 4, 2, 3))

        np.save(os.path.join(self._logdir, f"gt_seq_{it}.npy"), to_cf(gt))
        np.save(os.path.join(self._logdir, f"gen_images_{it}.npy"), to_cf(gen))
        np.save(os.path.join(self._logdir, f"full_gen_seq_{it}.npy"), to_cf(full))

        # per-batch prior sample collections (compute_metrics.py seq_samples)
        first_batch_samples = self.full_evaluation.rand_seqs[0]
        if first_batch_samples:
            samples = np.stack(first_batch_samples, 1)  # [B, S, T, H, W, C]
            np.save(
                os.path.join(self._logdir, f"seq_samples_{it}.npy"),
                np.transpose(samples[: self.N_PLOTTED_ELEMENTS],
                             (0, 1, 2, 5, 3, 4)),
            )

        # qualitative GT-vs-best strips + gifs through the logging backend
        # (compute_metrics.py dump_gifs/dump_diverse_samples)
        from video_gcp_tpu.evaluation.visualization import seq_strip

        for i in range(min(self.N_PLOTTED_ELEMENTS, gt.shape[0])):
            strip = np.concatenate(
                [seq_strip(gt[i][None]), seq_strip(gen[i][None])], axis=0
            )
            self._eval_logger.log_image(strip, "gt_vs_best", i, it)
            self._eval_logger.log_gif(gen[i], "best_gen", i, it)
