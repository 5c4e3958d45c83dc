"""Python-as-config loading, identical surface to the reference.

Experiment directories hold a `conf.py` exposing `configuration` (trainer
hparams: model class, dataset_name, batch_size, lr, ...) and `model_config`
dicts, inheriting by importing base configs (gcp_builder.get_configs,
gcp/prediction/training/gcp_builder.py:124-172). Dataset specifics live in
`dataset_spec.py` next to the data and in dataset config modules
(video_gcp_tpu.data.configs.<name>), merged into the model config. Env vars:
GCP_DATA_DIR, GCP_EXP_DIR (README.md:37-40).
"""
from __future__ import annotations

import importlib
import importlib.util
import os
import sys
from datetime import datetime

from video_gcp_tpu.core.attrdict import AttrDict
from video_gcp_tpu.core.params import ParamDict


def trainer_default_hparams() -> ParamDict:
    """gcp_builder._default_hparams (gcp_builder.py:252-272)."""
    return ParamDict(
        model=None,
        logger=None,
        dataset_name=None,
        batch_size=64,
        exp_path=None,
        num_epochs=200,
        epoch_cycles_train=1,
        optimizer="radam",
        lr=None,
        gradient_clip=None,
        momentum=0,
        adam_beta=0.9,
        metric_pruning_scheme="dtw",
        top_of_100_eval=True,
        n_rooms=None,
    )


def get_data_dir() -> str:
    return os.environ.get("GCP_DATA_DIR", "/tmp/gcp_data")


def get_exp_dir() -> str:
    return os.environ.get("GCP_EXP_DIR", "/tmp/gcp_experiments")


def get_dataset_path(dataset_name: str) -> str:
    return os.path.join(get_data_dir(), dataset_name)


def datetime_str() -> str:
    return datetime.now().strftime("_%Y-%m-%d_%H-%M-%S")


def load_module_from_path(path: str, name: str = "conf"):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def build_data_conf(dataset_name: str, override=None) -> AttrDict:
    """Per-dataset data_conf: the dataset directory's dataset_spec.py merged
    with overrides (gcp_builder.py:158-170). `override` defaults to the
    dataset's bundled config module (video_gcp_tpu.data.configs.<name>),
    which supplies the dataset_class (e.g. the maze top-down re-renderer) and
    render parameters — required when loading a dataset other than the
    experiment's own, as `--dataset_val_sweep` does."""
    data_conf = AttrDict(dataset_spec=AttrDict())
    spec_path = os.path.join(get_dataset_path(dataset_name), "dataset_spec.py")
    if os.path.isfile(spec_path):
        spec_mod = load_module_from_path(spec_path, "dataset_spec")
        data_conf.dataset_spec = AttrDict(spec_mod.dataset_spec)
    if override is None:
        try:
            override = importlib.import_module(
                "video_gcp_tpu.data.configs." + dataset_name
            ).config
        except ImportError:
            override = {}
    for key in override:
        if key == "dataset_spec":
            data_conf.dataset_spec.update(override["dataset_spec"])
        else:
            data_conf[key] = override[key]
    return data_conf


def load_config(conf_path: str) -> AttrDict:
    """Load conf.py + dataset config + dataset_spec into one bundle.

    :param conf_path: directory containing conf.py (the --path argument).
    :return: AttrDict(configuration, model_config, data_conf, exp_name)
    """
    conf_file = os.path.join(os.path.abspath(conf_path), "conf.py")
    if not os.path.isfile(conf_file):
        raise ValueError(f"Config file not found: {conf_file}")
    conf_module = load_module_from_path(conf_file)

    configuration = trainer_default_hparams()
    configuration.overwrite(conf_module.configuration)
    model_config = AttrDict(conf_module.model_config)

    dataset_name = configuration.get("dataset_name", None)
    if dataset_name is not None:
        override = (conf_module.data_config
                    if hasattr(conf_module, "data_config") else None)
        data_conf = build_data_conf(dataset_name, override)
    else:
        data_conf = AttrDict(dataset_spec=AttrDict())
        if hasattr(conf_module, "data_config"):
            for key, val in conf_module.data_config.items():
                if key == "dataset_spec":
                    data_conf.dataset_spec.update(val)
                else:
                    data_conf[key] = val
    if "fps" not in data_conf:
        data_conf.fps = 4

    # merge dataset spec into model config (gcp_builder.py:68)
    for key in ["max_seq_len", "n_actions", "state_dim"]:
        if key in data_conf.dataset_spec:
            model_config.setdefault(key, data_conf.dataset_spec[key])
    if "dataset_class" in data_conf.dataset_spec:
        model_config.setdefault("dataset_class",
                                data_conf.dataset_spec["dataset_class"])

    # exp_name is the config path relative to the experiments/ root
    # (gcp_builder.py:137-139): control configs resolve trained checkpoints
    # as GCP_EXP_DIR + '/prediction/<env>/<model>', so the 'prediction/'
    # prefix must survive into the experiment directory layout
    parts = os.path.abspath(conf_path).split(os.sep)
    if "experiments" in parts:
        exp_name = os.sep.join(parts[parts.index("experiments") + 1:])
    else:
        exp_name = os.sep.join(parts[-2:])
    return AttrDict(
        configuration=configuration,
        model_config=model_config,
        data_conf=data_conf,
        conf_path=os.path.abspath(conf_path),
        exp_name=exp_name,
    )


# published dataset archives (utils.py:79-93, URLs README.md:129-136);
# module-level so tests can point an entry at a local file:// fixture
DATASET_URLS = dict(
    nav_9rooms="https://www.seas.upenn.edu/~oleh/datasets/gcp/nav_9rooms.zip",
    nav_25rooms="https://www.seas.upenn.edu/~oleh/datasets/gcp/nav_25rooms.zip",
    sawyer="https://www.seas.upenn.edu/~oleh/datasets/gcp/sawyer.zip",
    h36m="https://www.seas.upenn.edu/~oleh/datasets/gcp/h36m.zip",
)


def download_data(dataset_name: str) -> None:
    """Auto-download + unzip of published datasets on first use
    (utils.py:79-93)."""
    urls = DATASET_URLS
    path = get_dataset_path(dataset_name)
    if os.path.exists(path):
        return  # local (incl. self-generated) datasets need no download
    if dataset_name not in urls:
        raise ValueError(f"Dataset identifier {dataset_name} is not known!")
    import urllib.request
    import zipfile
    import tempfile

    url = urls[dataset_name]
    print(f"Downloading dataset from {url} to {get_data_dir()}...")
    os.makedirs(get_data_dir(), exist_ok=True)
    with tempfile.NamedTemporaryFile(suffix=".zip", delete=False) as tmp:
        urllib.request.urlretrieve(url, tmp.name)
        with zipfile.ZipFile(tmp.name) as z:
            z.extractall(get_data_dir())
    os.unlink(tmp.name)
