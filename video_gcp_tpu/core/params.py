"""Typed hyperparameter store with config-hygiene rules.

Replaces the reference's ``tensorflow.contrib.training.HParams`` usage
(gcp/prediction/training/base_trainer.py:9-14) including its deliberate
"override must differ from default" rule: overriding a hparam with a value equal
to the default raises, catching stale config entries. Also replaces blox
``ParamDict`` with ``.overwrite`` semantics used by the CEM planner
(gcp/planning/cem/cem_planner.py:25).
"""
from __future__ import annotations

from typing import Any, Mapping

from video_gcp_tpu.core.attrdict import AttrDict


class ParamDict(AttrDict):
    """AttrDict for hyperparameters with strict override semantics."""

    def override(self, params: Mapping[str, Any], strict: bool = True) -> "ParamDict":
        """Override defaults with a config mapping.

        :param strict: if True, raise if an override key is unknown or equals
            the default value (the reference's config-hygiene rule,
            base_trainer.py:12-13).
        """
        for k, v in params.items():
            if strict and k not in self:
                raise KeyError(f"Cannot override untyped hyperparameter {k!r}")
            if strict and k in self and _safe_equal(self[k], v):
                raise ValueError(
                    f"Attempted to override hparam {k!r} with default value {v!r}"
                )
            self[k] = v
        return self

    def overwrite(self, params: Mapping[str, Any]) -> "ParamDict":
        """Non-strict update (blox ParamDict.overwrite semantics)."""
        for k, v in params.items():
            self[k] = v
        return self

    def add_hparam(self, key: str, value: Any) -> None:
        if key in self:
            raise KeyError(f"Hyperparameter {key!r} already exists")
        self[key] = value


def _safe_equal(a: Any, b: Any) -> bool:
    try:
        res = a == b
        if isinstance(res, bool):
            return res
        return bool(getattr(res, "all", lambda: False)())
    except Exception:
        return False
