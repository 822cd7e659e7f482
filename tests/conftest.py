"""Test harness config: force an 8-device virtual CPU mesh.

The environment registers the TPU ('axon') backend at interpreter startup via
sitecustomize, so plain JAX_PLATFORMS env tweaks are too late — override
through jax.config before any backend is initialized. Mirrors how multi-chip
sharding is validated without TPU pods (SURVEY.md §4).
"""

import os
import re

_flags = os.environ.get("XLA_FLAGS", "")
_m = re.search(r"--xla_force_host_platform_device_count=(\d+)", _flags)
if _m is None:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
elif int(_m.group(1)) < 8:
    # a pre-set smaller count (common in other JAX projects' shells) would
    # make the 8-device mesh tests fail with opaque reshape errors —
    # override it; tests hard-require >= 8 virtual devices
    os.environ["XLA_FLAGS"] = _flags.replace(
        _m.group(0), "--xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
