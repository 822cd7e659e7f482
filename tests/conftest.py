"""Test harness config: force an 8-device virtual CPU mesh.

The environment registers the TPU ('axon') backend at interpreter startup via
sitecustomize, so plain JAX_PLATFORMS env tweaks are too late — override
through jax.config before any backend is initialized. Mirrors how multi-chip
sharding is validated without TPU pods (SURVEY.md §4).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
