"""Test configuration: run on CPU with a virtual 8-device mesh.

Multi-device sharding tests use XLA's host-platform device partitioning —
the TPU analogue of a fake backend (SURVEY.md §4 implication (d)).

NOTE: this environment's sitecustomize registers an 'axon' TPU-tunnel PJRT
plugin and force-sets jax_platforms='axon,cpu' at interpreter start, which
silently overrides the JAX_PLATFORMS env var and routes every test compile
through a slow remote tunnel. We override the config back to cpu here, before
any backend is initialized.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
if jax._src.xla_bridge.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()
