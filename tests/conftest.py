"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The container pins JAX_PLATFORMS=axon (the TPU tunnel) via sitecustomize,
so the env var alone is not enough — override the jax config directly
before any device is touched.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
