"""Training driver: epoch loop, validation, checkpointing, resume.

Rebuilds gcp/prediction/train.py:23-239 + gcp_builder.py TPU-first: the
per-batch work is one jitted sharded train step (parallel.train_step); the
host loop only feeds prefetched batches and logs. Validation computes the NLL
with the train-mode posterior (train.py:211-215) plus image metrics
(PSNR/SSIM/MSE) on prior samples; the full top-of-100 protocol lives in
video_gcp_tpu.evaluation.

CLI (subset of gcp_builder.get_cmd_args):
    python -m video_gcp_tpu.training.train --path <conf_dir> [--resume latest]
        [--train 1] [--deterministic 0] [--val_data_size -1] [--debug 0]
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.metrics import mse, psnr, ssim
from video_gcp_tpu.data.loader import DataLoader
from video_gcp_tpu.parallel.mesh import batch_sharding, make_mesh
from video_gcp_tpu.parallel.train_step import (
    TrainState,
    make_optimizer,
    make_train_step,
    make_val_step,
)
from video_gcp_tpu.training import checkpoint as ckpt
from video_gcp_tpu.training.config import (
    get_dataset_path,
    get_exp_dir,
    load_config,
)
from video_gcp_tpu.training.logger import Logger


class AverageMeter:
    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, v):
        self.sum += v
        self.count += 1

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--path", required=True)
    p.add_argument("--prefix", default="")
    p.add_argument("--new_dir", default=0, type=int)
    p.add_argument("--resume", default="latest")
    p.add_argument("--train", default=1, type=int)
    p.add_argument("--metric", default=0, type=int)
    p.add_argument("--val_sweep", default=0, type=int)
    p.add_argument("--dataset_val_sweep", default=0, type=int)
    p.add_argument("--deterministic", default=0, type=int)
    p.add_argument("--val_data_size", default=-1, type=int)
    p.add_argument("--log_outputs_interval", default=10, type=int)
    p.add_argument("--imepoch", default=4, type=int)
    p.add_argument("--skip_first_val", default=0, type=int)
    p.add_argument("--feed_random_data", default=0, type=int)
    p.add_argument("--debug", default=0, type=int)
    p.add_argument("--verbose_timing", default=0, type=int)
    p.add_argument("--val_metric_batches", default=4, type=int,
                   help="val batches for the quick per-epoch PSNR/SSIM/MSE "
                        "stand-in (single prior sample; covers the whole val "
                        "split when it has fewer batches). The per-epoch curve "
                        "is inherently noisy on small splits — the reported "
                        "protocol is the full top-of-100 eval (--metric 1)")
    p.add_argument("--num_epochs", default=0, type=int,
                   help="override configuration['num_epochs'] when > 0")
    p.add_argument("--train_deadline", default=0, type=float,
                   help="absolute wall deadline (epoch seconds); when set, "
                        "stop cleanly (rc 0) at the first epoch boundary "
                        "past it — checkpoints land every epoch, so the run "
                        "stays resumable and eval-able at the achieved epoch")
    return p.parse_args(argv)


class ModelTrainer:
    def __init__(self, args):
        from video_gcp_tpu.core.compile_cache import (
            enable_persistent_compile_cache,
        )

        enable_persistent_compile_cache()
        self.args = args
        # multi-host: join the jax.distributed mesh when launched as one
        # process of a multi-host job (SURVEY.md §2.14 TPU-native mapping)
        if os.environ.get("GCP_MULTIHOST", "0") == "1":
            jax.distributed.initialize()
        bundle = load_config(args.path)
        self.conf = bundle.configuration
        self.model_config = AttrDict(bundle.model_config)
        self.data_conf = bundle.data_conf

        if args.deterministic:
            np.random.seed(0)

        # experiment dir
        exp_name = bundle.exp_name
        base = os.path.join(get_exp_dir(), exp_name)
        if args.prefix:
            base = os.path.join(base, args.prefix)
        from video_gcp_tpu.training.config import datetime_str

        if args.new_dir:
            base = base + datetime_str()
        self.exp_path = base
        os.makedirs(self.exp_path, exist_ok=True)
        ckpt.save_provenance(self.exp_path)
        self.logger = Logger(os.path.join(self.exp_path, "events"))

        # model hparams = defaults <- model_config <- data dims
        from video_gcp_tpu.models.hyperparameters import default_hparams

        hp = default_hparams()
        mc = dict(self.model_config)
        mc.setdefault("batch_size", self.conf["batch_size"])
        model_cls = self.conf["model"]
        mc.pop("dataset_class", None)
        # strict override rule (base_trainer.py:9-14) for known keys
        known = {k: v for k, v in mc.items() if k in hp}
        unknown = {k: v for k, v in mc.items() if k not in hp}
        hp.override(known)
        hp.overwrite(unknown)
        self.hp = hp
        self.model = model_cls(hp=dict(hp))

        # datasets
        self.train_loader, self.val_loader = self._build_loaders()

        # optimizer + train step
        tx = make_optimizer(
            self.conf["optimizer"], self.conf["lr"] or 1e-3,
            self.conf["gradient_clip"], self.conf["momentum"],
            self.conf["adam_beta"],
        )
        # data mesh over as many devices as evenly divide the global batch;
        # GCP_FSDP=k adds a k-wide 'model' axis (dp x fsdp: params +
        # optimizer moments sharded, see parallel.mesh.param_shardings)
        n_dev = len(jax.devices())
        fsdp = int(os.environ.get("GCP_FSDP", "1"))
        bs = self.conf["batch_size"]
        while n_dev > 1 and (bs % max(n_dev // fsdp, 1) != 0
                             or n_dev % fsdp != 0):
            n_dev -= 1
        if n_dev > 1 and fsdp > 1:
            self.mesh = make_mesh(n_dev, ("data", "model"),
                                  (n_dev // fsdp, fsdp))
        else:
            self.mesh = make_mesh(n_dev) if n_dev > 1 else None
        self.rng = jax.random.PRNGKey(0 if args.deterministic else int(time.time()))

        sample_batch = next(iter(self.train_loader))
        init_rng = jax.random.PRNGKey(0)
        params = jax.jit(
            lambda b: self.model.init(
                {"params": init_rng, "sample": init_rng}, b, "train", "posterior"
            )
        )(sample_batch)
        self.state = TrainState.create(params, tx)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"model parameters: {n_params}")

        self.train_step = make_train_step(self.model, self.mesh,
                                          state=self.state)
        self.val_step = make_val_step(self.model)

        # resume
        self.start_epoch = 0
        path = ckpt.resolve_resume(args.resume, self.exp_path)
        if path is not None:
            print(f"resuming from {path}")
            if path.endswith(".npz"):
                # pretrained flat-npz restore: params only, optimizer fresh
                loaded = ckpt.load_pretrained_npz(path)
                self.state = self.state.replace(
                    params=jax.tree_util.tree_map(
                        lambda tpl, arr: jax.numpy.asarray(arr, tpl.dtype),
                        self.state.params, loaded))
            else:
                self.state = ckpt.load_checkpoint(path, self.state)
                import re

                m = re.search(r"weights_ep(\d+)", path)
                if m:
                    self.start_epoch = int(m.group(1)) + 1

    # ------------------------------------------------------------------

    def _build_loaders(self):
        args = self.args
        data_conf = self.data_conf
        dataset_name = self.conf.get("dataset_name", None)
        mpar = dict(self.hp)

        if args.feed_random_data or dataset_name is None:
            from video_gcp_tpu.data.datasets import RandomVideoDataset

            train_set = RandomVideoDataset(None, mpar, data_conf, "train",
                                           dataset_size=256)
            val_set = RandomVideoDataset(None, mpar, data_conf, "val",
                                         dataset_size=32)
        else:
            from video_gcp_tpu.training.config import download_data

            download_data(dataset_name)
            data_dir = get_dataset_path(dataset_name)
            dset_cls = self._dataset_class()
            train_set = dset_cls(data_dir, mpar, data_conf, "train")
            val_set = dset_cls(
                data_dir, mpar, data_conf, "val",
                shuffle=False, dataset_size=args.val_data_size,
            )

        sharding = batch_sharding(self.mesh) if getattr(self, "mesh", None) else None
        bs = self.conf["batch_size"]
        n_workers = int(os.environ.get("GCP_N_DATA_WORKERS", "8"))
        train_loader = DataLoader(
            train_set, bs, shuffle=True,
            n_repeat=self.conf["epoch_cycles_train"], sharding=sharding,
            num_workers=n_workers,
        )
        # drop_last=False: published split fractions leave val sets smaller
        # than one train batch (0.006 of the dataset); dropping short batches
        # would validate on nothing
        val_loader = DataLoader(val_set, bs, shuffle=False, sharding=sharding,
                                num_workers=n_workers, drop_last=False)
        return train_loader, val_loader

    def _dataset_class(self):
        spec_cls = self.data_conf.dataset_spec.get("dataset_class", None)
        if spec_cls is not None and not isinstance(spec_cls, str):
            return spec_cls
        from video_gcp_tpu.data.datasets import GlobalSplitVarLenVideoDataset

        return GlobalSplitVarLenVideoDataset

    # ------------------------------------------------------------------

    def run(self):
        args = self.args
        if args.num_epochs > 0:
            self.conf["num_epochs"] = args.num_epochs
        if args.val_sweep:
            for epoch in ckpt.get_epochs(self.exp_path):
                path = os.path.join(ckpt.weights_dir(self.exp_path),
                                    ckpt.ckpt_name(epoch))
                self.state = ckpt.load_checkpoint(path, self.state)
                self.val(epoch)
            return
        if args.dataset_val_sweep:
            self.run_dataset_val_sweep()
            return
        if args.metric:
            self.run_metric_eval()
            return
        if not args.train:
            self.val(self.start_epoch)
            return
        for epoch in range(self.start_epoch, self.conf["num_epochs"]):
            if args.train_deadline and time.time() > args.train_deadline:
                print(f"train_deadline reached before epoch {epoch} — "
                      f"stopping cleanly (latest checkpoint: ep{epoch - 1})",
                      flush=True)
                break
            self.train_epoch(epoch)
            ckpt.save_checkpoint(self.exp_path, epoch, self.state)
            if not (epoch == 0 and args.skip_first_val):
                self.val(epoch)

    def run_dataset_val_sweep(self):
        """Validate the current checkpoint across a collection of datasets,
        re-deriving hierarchy_levels = ceil(log2(max_seq_len)) per dataset
        (train.py:80-81). Works for tied-layer tree models whose per-level
        parameters are shared (depth-independent param structure)."""
        import math

        sweeps = self.conf.get("dataset_sweep_specs", [])
        assert sweeps, "set configuration['dataset_sweep_specs'] for the sweep"
        assert not self.hp.get("untied_layers", False), (
            "dataset sweep re-derives tree depth; needs tied layers"
        )
        base_model_cls = type(self.model)
        for spec in sweeps:
            hp = dict(self.hp)
            hp["max_seq_len"] = spec["max_seq_len"]
            if self.hp.get("hierarchy_levels", 0) > 0:
                hp["hierarchy_levels"] = int(
                    math.ceil(math.log2(spec["max_seq_len"]))
                )
            model = base_model_cls(hp=hp)
            # the swept dataset's OWN config (dataset_class, render params),
            # not the current experiment's — a sweep across datasets must use
            # each dataset's reader (e.g. nav_9rooms stores 128x128 frames
            # that its maze top-down class re-renders at the model's res)
            from video_gcp_tpu.training.config import build_data_conf

            data_conf = build_data_conf(spec["dataset_name"])
            data_conf.dataset_spec.max_seq_len = spec["max_seq_len"]
            dset_cls = data_conf.dataset_spec.get("dataset_class", None)
            if dset_cls is None or isinstance(dset_cls, str):
                dset_cls = self._dataset_class()
            val_set = dset_cls(
                get_dataset_path(spec["dataset_name"]), hp, data_conf, "val",
                shuffle=False, dataset_size=self.args.val_data_size,
            )
            # drop_last=False: published val splits are smaller than one
            # batch (12 examples vs batch 16) — dropping short batches
            # validated literally nothing and the sweep reported empty
            loader = DataLoader(val_set, self.conf["batch_size"],
                                shuffle=False, drop_last=False)
            if len(loader) == 0:
                raise RuntimeError(
                    f"dataset sweep {spec['dataset_name']}: empty val loader"
                )
            # shape-filtered restore: init the rebuilt model at this horizon
            # and merge every checkpoint leaf whose shape matches. Horizon-
            # dependent heads (e.g. the length predictor's max_seq_len-wide
            # output Dense, aux_models.py LengthPredictor) stay freshly
            # initialized and are reported — they only feed their own aux
            # loss line, not the reconstruction NLL (GT end_ind is used in
            # train-mode validation). The reference's non-strict torch load
            # cannot express this (torch raises on any shape mismatch).
            init_rng = jax.random.PRNGKey(0)
            sample_batch = next(iter(loader))
            fresh = jax.jit(
                lambda b: model.init(
                    {"params": init_rng, "sample": init_rng}, b, "train",
                    "posterior",
                )
            )(sample_batch)
            skipped = []

            def _pick(path, f, c):
                if f.shape == c.shape:
                    return jax.numpy.asarray(c, f.dtype)
                skipped.append(jax.tree_util.keystr(path))
                return f

            merged = jax.tree_util.tree_map_with_path(
                _pick, fresh, self.state.params
            )
            if skipped:
                print(f"[dataset sweep] horizon-dependent params kept fresh: "
                      f"{skipped}")
            old_model, old_loader = self.model, self.val_loader
            old_state = self.state
            self.model, self.val_loader = model, loader
            self.state = self.state.replace(params=merged)
            self.val_step = make_val_step(model)
            print(f"[dataset sweep] {spec['dataset_name']} "
                  f"(T={spec['max_seq_len']}, L={hp.get('hierarchy_levels')})")
            self.val(0)
            self.model, self.val_loader = old_model, old_loader
            self.state = old_state
            self.val_step = make_val_step(self.model)

    def run_metric_eval(self):
        """Full top-of-100 metric evaluation on the val set (--metric 1;
        reference train.py runs the Evaluator inside val when --metric)."""
        from video_gcp_tpu.evaluation.eval_logger import TBEvalLogger
        from video_gcp_tpu.evaluation.evaluator import Evaluator

        evaluator = Evaluator(
            self.model,
            self.exp_path,
            self.conf,
            max_seq_len=self.hp["max_seq_len"],
            pruning_scheme=self.conf["metric_pruning_scheme"],
            top_of_100=bool(self.conf["top_of_100_eval"]),
            use_images=self.hp["use_convs"],
            eval_logger=TBEvalLogger(
                os.path.join(self.exp_path, "metrics"), self.logger
            ),
        )
        rng = jax.random.PRNGKey(123)
        for i, batch in enumerate(self.val_loader):
            evaluator.eval(self.state.params, batch, jax.random.fold_in(rng, i))
        summary = evaluator.dump_results(int(self.state.step))
        step = int(self.state.step)
        for k, v in summary.items():
            self.logger.log_scalar(v, "eval_" + k, step, "val")
        self.logger.flush()
        return summary

    # with --verbose_timing, steps [start, stop) of the first trained epoch
    # are captured into exp_path/profile as a jax.profiler trace (view with
    # tensorboard / xprof; SURVEY §5.1). Step 0 is skipped so the compile
    # doesn't dominate the trace.
    PROFILE_STEPS = (2, 7)

    def train_epoch(self, epoch: int):
        meters = AttrDict(data=AverageMeter(), step=AverageMeter())
        log_interval = self.args.log_outputs_interval
        n_batches = len(self.train_loader)
        profile = self.args.verbose_timing and epoch == self.start_epoch
        t0 = time.time()
        epoch_rng = jax.random.fold_in(self.rng, epoch)
        for i, batch in enumerate(self.train_loader):
            t1 = time.time()
            meters.data.update(t1 - t0)
            if profile and i == self.PROFILE_STEPS[0]:
                jax.profiler.start_trace(os.path.join(self.exp_path, "profile"))
            self.state, metrics = self.train_step(self.state, batch, epoch_rng)
            if profile and i + 1 == self.PROFILE_STEPS[1]:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), self.state.params
                )
                jax.profiler.stop_trace()
                print(f"[profile] trace for steps {self.PROFILE_STEPS} "
                      f"written to {self.exp_path}/profile")
                profile = False
            if self.args.verbose_timing and i < 20:
                jax.block_until_ready(metrics)
                print(f"[timing] it {i}: t_data {t1 - t0:.4f}s "
                      f"t_step {time.time() - t1:.4f}s")
            if i % log_interval == 0:
                metrics = jax.device_get(metrics)
                step = int(self.state.step)
                scalars = {k: v for k, v in metrics.items()
                           if np.ndim(v) == 0}
                self.logger.log_scalar_dict(
                    {k + "_loss": v for k, v in scalars.items()}, step, "train"
                )
                for k, v in metrics.items():
                    if np.ndim(v) > 0:
                        self.logger.log_graph(v, k, step, "train")
                if not bool(metrics.get("grads_finite", True)):
                    self._dump_debug_data(batch, metrics, step)
                t2 = time.time()
                meters.step.update(t2 - t1)
                togo = (n_batches - i) * (meters.data.avg + meters.step.avg) / 60
                print(
                    f"epoch {epoch} it {i}/{n_batches} "
                    f"total: {metrics.get('total', float('nan')):.4f} "
                    f"t_data {meters.data.avg:.3f}s t_step {meters.step.avg:.3f}s "
                    f"ETA {togo:.1f}min"
                )
            else:
                meters.step.update(time.time() - t1)
            t0 = time.time()

    def val(self, epoch: int):
        losses_acc = {}
        img_metrics = {"psnr": [], "ssim": [], "mse": []}
        val_rng = jax.random.fold_in(self.rng, 10_000 + epoch)
        n = 0
        t0 = time.time()
        for batch in self.val_loader:
            # NLL with train-mode posterior (train.py:211-215)
            losses = jax.device_get(self.val_step(self.state, batch, val_rng))
            for k, v in losses.items():
                losses_acc.setdefault(k, []).append(float(v))
            n += 1
            if n <= self.args.val_metric_batches:
                self._quick_image_metrics(batch, val_rng, img_metrics)
            if n == 1:
                self._log_posterior_viz(batch, val_rng)
        step = int(self.state.step)
        for k, vals in losses_acc.items():
            self.logger.log_scalar(np.mean(vals), k + "_loss", step, "val")
        for k, vals in img_metrics.items():
            if vals:
                self.logger.log_scalar(np.mean(vals), k, step, "val")
        print(
            f"[val] epoch {epoch} "
            + " ".join(f"{k}: {np.mean(v):.4f}" for k, v in losses_acc.items())
            + (f" | psnr {np.mean(img_metrics['psnr']):.2f}"
               if img_metrics["psnr"] else "")
            + f" ({time.time() - t0:.1f}s)"
        )
        self.logger.flush()

    def _quick_image_metrics(self, batch, rng, acc):
        """Prior-sample PSNR/SSIM/MSE on one val batch (cheap stand-in for the
        full top-of-100 evaluator, which lives in evaluation/)."""
        from video_gcp_tpu.core.metrics import to_float_images

        batch = AttrDict(batch)
        batch.traj_seq = to_float_images(batch.traj_seq)
        if not hasattr(self, "_prior_apply"):
            # cache the jitted fn: a fresh jax.jit per epoch would recompile
            self._prior_apply = jax.jit(
                lambda p, b, r: self.model.apply(
                    p, b, "test", "prior", rngs={"sample": r}
                )
            )
        out = self._prior_apply(self.state.params, batch, rng)
        pred = self._dense_prediction(out, batch)
        if pred is None:
            return
        self._log_val_images(out, batch, pred)
        if not self.hp.get("use_convs", True):
            return  # image metrics over state vectors are meaningless
        mask = np.asarray(batch.pad_mask)
        p = np.asarray(psnr(pred, batch.traj_seq))
        s = np.asarray(ssim(pred, batch.traj_seq))
        m = np.asarray(mse(pred, batch.traj_seq))
        denom = mask.sum()
        acc["psnr"].append((p * mask).sum() / denom)
        acc["ssim"].append((s * mask).sum() / denom)
        acc["mse"].append((m * mask).sum() / denom)

    def _log_val_images(self, out, batch, pred):
        """Per-epoch TB visualizations (HierarchyLogger family)."""
        step = int(self.state.step)
        if not self.hp.get("use_convs", True):
            # state-space models: top-down overlay of the predicted
            # trajectory itself (base_gcp.py:329-330 prediction_topdown)
            if pred is not None:
                self._log_topdown_overlay(out, batch, pred,
                                          "prediction_topdown", step)
            return
        from video_gcp_tpu.evaluation import visualization as vis
        gt = jax.device_get(batch.traj_seq)
        gen = jax.device_get(pred)
        self.logger.log_images(
            np.stack([vis.seq_strip(gt), vis.seq_strip(gen)]),
            "val_gt_vs_pred", step, "val",
        )
        self.logger.log_video(gen[0], "val_pred_gif", step, "val")
        if "tree" in out:
            images_bf = jax.device_get(out.tree.images)
            self.logger.log_images(
                vis.plot_balanced_tree(images_bf)[None],
                "output_tree", step, "val",
            )
            if "prune_keep" in out:
                from video_gcp_tpu.ops.tree_index import breadthfirst2depthfirst

                images_df = jax.device_get(
                    breadthfirst2depthfirst(out.tree.images)
                )
                self.logger.log_images(
                    vis.plot_pruned_seq(images_df,
                                        jax.device_get(out.prune_keep))[None],
                    "pruned_pred", step, "val",
                )

    def _log_posterior_viz(self, batch, rng):
        """Train-mode posterior visualizations on one val batch per epoch:
        GT-match overview + attention masks (logger.py:195-199, tree.py:104)
        and the regressed-state top-down overlay (base_gcp.py:313-316) —
        these need the matched timeline / aux outputs, which only the train
        phase produces."""
        want_overlay = hasattr(self._dataset_class(), "render_trajectory")
        use_convs = self.hp.get("use_convs", True)
        if not (use_convs or want_overlay):
            return
        if not hasattr(self, "_posterior_apply"):
            self._posterior_apply = jax.jit(
                lambda p, b, r, s: self.model.apply(
                    p, b, "train", "posterior", step=s, rngs={"sample": r}
                )
            )
        out = self._posterior_apply(self.state.params, batch, rng,
                                    self.state.step)
        step = int(self.state.step)
        if use_convs and "tree" in out:
            from video_gcp_tpu.evaluation import visualization as vis

            imgs = jax.device_get(out.tree.images)
            gt = jax.device_get(batch.traj_seq)
            if "gt_match_dists" in out:
                self.logger.log_images(
                    vis.plot_gt_matching_overview(
                        imgs, jax.device_get(out.gt_match_dists), gt
                    )[None],
                    "gt_match_overview", step, "val",
                )
            if out.tree.get("gamma", None) is not None:
                gamma = np.asarray(jax.device_get(out.tree.gamma))
                if gamma.ndim == 4:  # [B, N, heads, T] -> head-averaged
                    gamma = gamma.mean(2)
                self.logger.log_images(
                    vis.plot_gt_matching_overview(imgs, gamma, gt)[None],
                    "attention_masks", step, "val",
                )
        if want_overlay and "regressed_state" in out:
            self._log_topdown_overlay(out, batch, out.regressed_state,
                                      "regressed_state_topdown", step)

    def _log_topdown_overlay(self, out, batch, predictions, name, step):
        """Dataset-protocol trajectory overlay (logger.py:271-289
        log_dataset_specific_trajectory): the dataset class renders GT vs
        predicted states into its top-down view."""
        dset_cls = self._dataset_class()
        if not hasattr(dset_cls, "render_trajectory"):
            return
        im = dset_cls.render_trajectory(
            out, batch, np.asarray(jax.device_get(predictions)),
            np.asarray(jax.device_get(batch.end_ind)),
        )
        if "image" in im:
            # renderer returns [N, H, W, 3] in [0, 1]; Logger expects [-1, 1]
            self.logger.log_images(np.asarray(im["image"]) * 2.0 - 1.0,
                                   name, step, "val")
        if "video" in im:
            self.logger.log_video(np.asarray(im["video"]) * 2.0 - 1.0,
                                  name, step, "val")

    def _dense_prediction(self, out, batch):
        """Dense [B, T, ...] prediction for metric computation."""
        if "dense_rec" in out:  # sequential
            return out.dense_rec.images[:, : batch.traj_seq.shape[1]]
        if "tree" in out:  # tree: warp df-ordered nodes onto GT timeline
            from video_gcp_tpu.ops.dtw import dtw_warp_sequence
            from video_gcp_tpu.ops.tree_index import breadthfirst2depthfirst

            nodes_df = breadthfirst2depthfirst(out.tree.images)
            warped, _ = dtw_warp_sequence(nodes_df, batch.traj_seq,
                                          batch.end_ind)
            return warped
        return None

    def _dump_debug_data(self, batch, metrics, step):
        """Non-finite grads: dump the batch + metrics for offline debugging
        (the reference's NaN hook dumps a pickle, base_trainer.py:40-66)."""
        import pickle

        path = os.path.join(self.exp_path, f"debug_nan_step{step}.pkl")
        with open(path, "wb") as f:
            pickle.dump(
                dict(batch=jax.device_get(batch), metrics=metrics), f
            )
        print(f"WARNING: non-finite gradients at step {step}; dumped {path}")


def main(argv=None):
    args = parse_args(argv)
    ModelTrainer(args).run()


if __name__ == "__main__":
    main()
