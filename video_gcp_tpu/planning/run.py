"""Planning / control / data-generation CLI with worker parallelism.

Reference: gcp/planning/run.py:36-153. Loads a `mod_hyper.py` control config
(python-as-config exposing `config` with agent/policy sub-dicts), splits the
trajectory index range over worker processes, and runs `run_trajectories`
per worker.

Usage:
    python -m video_gcp_tpu.planning.run <mod_hyper.py> [--nworkers N]
        [--start_idx A] [--end_idx B] [--resume_from IDX] [--iex I]
"""
from __future__ import annotations

import argparse
import copy
import importlib.machinery
import importlib.util
import os
from multiprocessing import Pool

import numpy as np

from video_gcp_tpu.core.platform import apply_platform_env

apply_platform_env()

from video_gcp_tpu.planning.infra.sim.benchmarks import run_trajectories  # noqa: E402


def bench_worker(conf, iex=-1, ngpu=1):
    """One worker's trajectory loop (run.py:16-22)."""
    np.random.seed(None)  # reseed per worker
    run_trajectories(conf, iex, gpu_id=conf.get("gpu_id", 0), ngpu=ngpu)


def load_control_config(path: str):
    loader = importlib.machinery.SourceFileLoader("mod_hyper", path)
    spec = importlib.util.spec_from_loader(loader.name, loader)
    mod = importlib.util.module_from_spec(spec)
    loader.exec_module(mod)
    return dict(mod.config)


class ControlManager:
    def __init__(self, args=None):
        parser = argparse.ArgumentParser()
        parser.add_argument("experiment", help="path to mod_hyper.py config")
        parser.add_argument("--nworkers", type=int, default=1)
        parser.add_argument("--gpu_id", type=int, default=0)
        parser.add_argument("--ngpu", type=int, default=1)
        parser.add_argument("--start_idx", type=int, default=None)
        parser.add_argument("--end_idx", type=int, default=None)
        parser.add_argument("--nsplit", type=int, default=-1,
                            help="number of splits of the full index range")
        parser.add_argument("--isplit", type=int, default=-1,
                            help="index of the split to run")
        parser.add_argument("--resume_from", type=int, default=None)
        parser.add_argument("--iex", type=int, default=-1,
                            help="run only this example index")
        self.args = parser.parse_args(args)

    def run(self):
        from video_gcp_tpu.core.compile_cache import (
            enable_persistent_compile_cache,
        )

        enable_persistent_compile_cache()
        # stall diagnosis: GCP_STACK_DUMP=<file> dumps all-thread stacks
        # every 60s — the tool for "the tunnel/compile is silent, where is
        # the worker stuck?" (SURVEY §5.2: the rebuild's sanitizer surface)
        dump_path = os.environ.get("GCP_STACK_DUMP")
        if dump_path:
            import faulthandler

            faulthandler.dump_traceback_later(
                60, repeat=True, file=open(dump_path, "w"))
        args = self.args
        conf = load_control_config(os.path.abspath(args.experiment))

        exp_dir = os.path.dirname(os.path.abspath(args.experiment))
        conf.setdefault("current_dir", exp_dir)
        conf.setdefault("log_dir", os.path.join(exp_dir, "log"))
        conf.setdefault("data_save_dir", os.path.join(exp_dir, "data"))
        os.makedirs(conf["log_dir"], exist_ok=True)
        os.makedirs(conf["data_save_dir"], exist_ok=True)

        start = args.start_idx if args.start_idx is not None \
            else conf.get("start_index", 0)
        end = args.end_idx if args.end_idx is not None \
            else conf.get("end_index", conf.get("ntraj", 1) - 1)

        # split the global range when running as one shard of many
        if args.nsplit != -1:
            assert args.isplit >= 0
            n = end - start + 1
            per = -(-n // args.nsplit)
            start = start + args.isplit * per
            end = min(start + per - 1, end)
        if args.resume_from is not None:
            start = args.resume_from

        if args.nworkers == 1:
            conf.update(start_index=start, end_index=end, gpu_id=args.gpu_id)
            bench_worker(conf, args.iex, args.ngpu)
        else:
            confs = []
            n = end - start + 1
            per = -(-n // args.nworkers)
            for i in range(args.nworkers):
                modconf = copy.deepcopy(conf)
                modconf["start_index"] = start + i * per
                modconf["end_index"] = min(start + (i + 1) * per - 1, end)
                modconf["gpu_id"] = i + args.gpu_id
                confs.append(modconf)
            with Pool(args.nworkers) as p:
                p.map(bench_worker, confs)


def main(argv=None):
    ControlManager(argv).run()


if __name__ == "__main__":
    main()
