"""Torch-free reader for PyTorch zip checkpoints (.pt / .pth).

The modern torch serialization format (torch >= 1.6) is a zip archive:
`<prefix>/data.pkl` holds the pickled object graph; tensor payloads live as
raw little-endian buffers under `<prefix>/data/<key>`. Tensors are encoded
via a persistent-id handshake (`('storage', <StorageType>, key, location,
numel)`) plus a `torch._utils._rebuild_tensor_v2(storage, offset, size,
stride, ...)` reducer. Reconstructing numpy arrays therefore needs no torch
at all — just pickle with a custom `persistent_load`/`find_class` and a
strided view over the raw buffer.

Used to ingest published I3D / AlexNet-LPIPS weights
(ref: gcp/evaluation/fvd/compute_fvd.py:27-88, lpips TF/torch checkpoints)
without pulling the multi-hundred-MB torch runtime into the framework.
Only `weights_only`-style content is accepted: any pickle global outside the
torch tensor-rebuilding set raises `UnpicklingError`.
"""
from __future__ import annotations

import collections
import pickle
import zipfile

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
}


def _bfloat16_dtype():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


class _StorageRef:
    """Raw buffer + element dtype for one serialized storage."""

    __slots__ = ("array",)

    def __init__(self, raw: bytes, dtype: np.dtype):
        self.array = np.frombuffer(raw, dtype=dtype)


def _rebuild_tensor(storage: _StorageRef, offset, size, stride, *_args):
    base = storage.array[offset:]
    if not size:  # 0-dim tensor
        return base[:1].reshape(()).copy()
    itemsize = base.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        base, shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return view.copy()


class _StorageTag:
    def __init__(self, name: str):
        self.name = name


_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): collections.OrderedDict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_parameter"):
        lambda data, *a: data,
}


class _TensorUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file, encoding="latin1")
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module, name):
        if (module, name) in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[(module, name)]
        if module == "torch" and name.endswith("Storage"):
            return _StorageTag(name)
        raise pickle.UnpicklingError(
            f"refusing to load non-tensor global {module}.{name} "
            "(weights-only reader)"
        )

    def persistent_load(self, pid):
        kind, storage, key = pid[0], pid[1], pid[2]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {kind!r}")
        name = storage.name if isinstance(storage, _StorageTag) else str(storage)
        if name == "BFloat16Storage":
            dtype = _bfloat16_dtype()
        else:
            try:
                dtype = _STORAGE_DTYPES[name]
            except KeyError:
                raise pickle.UnpicklingError(
                    f"unsupported storage type {name}"
                ) from None
        raw = self._zf.read(f"{self._prefix}/data/{key}")
        return _StorageRef(raw, dtype)


def load_state_dict(path: str) -> dict:
    """Read a torch zip checkpoint into {name: np.ndarray} without torch.

    bfloat16 tensors come back as ml_dtypes.bfloat16 arrays. Raises
    `pickle.UnpicklingError` on legacy (non-zip) files or pickles that
    reference anything beyond plain tensors/state dicts.
    """
    try:
        zf_ctx = zipfile.ZipFile(path)
    except zipfile.BadZipFile:
        raise pickle.UnpicklingError(
            f"{path}: not a torch zip checkpoint; legacy tar-format .pth "
            "files are not supported"
        ) from None
    with zf_ctx as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise pickle.UnpicklingError(
                f"{path}: not a torch zip checkpoint (no data.pkl); legacy "
                "tar-format .pth files are not supported"
            )
        prefix = pkl_names[0][: -len("/data.pkl")]
        with zf.open(pkl_names[0]) as f:
            obj = _TensorUnpickler(f, zf, prefix).load()
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise pickle.UnpicklingError(
            f"{path}: expected a state dict, got {type(obj).__name__}"
        )
    return {k: np.asarray(v) for k, v in obj.items()}
