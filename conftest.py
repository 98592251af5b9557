"""Root conftest: configure JAX for testing BEFORE any test imports it.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding validation
without TPU hardware) in float64 (dense-oracle numerical parity with the
float64 reference). The TPU production path is exercised by bench.py.

Note: the environment's sitecustomize force-registers a TPU ('axon')
PJRT plugin and pins JAX_PLATFORMS — env vars alone don't stick, so we
override via jax.config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
