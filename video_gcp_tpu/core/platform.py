"""Opt-in JAX platform override for CLI entries.

This environment's sitecustomize registers an 'axon' TPU-tunnel PJRT plugin
and force-sets jax_platforms='axon,cpu' at interpreter start, which silently
overrides the JAX_PLATFORMS env var and routes every process onto the single
TPU chip. That breaks the one-TPU-job-at-a-time rule whenever a CPU-side
repro/debug run is launched while a hardware job is in flight.

`apply_platform_env()` honors GCP_PLATFORM (e.g. GCP_PLATFORM=cpu) by calling
jax.config.update *in-process* — the only override that survives the
sitecustomize hijack (same mechanism as tests/conftest.py). Must run before
any JAX backend initialization, so CLI entries call it first thing.
"""
from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("GCP_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
