"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are exercised on a virtual CPU mesh
(xla_force_host_platform_device_count), per the repo's test strategy
(SURVEY.md §4).

Note: this machine's sitecustomize registers a remote-TPU ("axon") PJRT
plugin and force-sets jax_platforms to "axon,cpu", overriding the
JAX_PLATFORMS env var — so the config must be re-overridden *after* importing
jax (before any computation initializes a backend). The remote-TPU path is
reserved for bench.py.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
