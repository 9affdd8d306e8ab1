"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(xla_force_host_platform_device_count), per the repo's test strategy
(SURVEY.md §4). Must run before jax is imported anywhere.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
