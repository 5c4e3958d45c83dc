"""Test configuration: run on CPU with a virtual 8-device mesh.

Multi-device sharding tests use XLA's host-platform device partitioning —
the TPU analogue of a fake backend (SURVEY.md §4 implication (d)).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
