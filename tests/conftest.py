"""Test harness: force an 8-device virtual CPU mesh before any test runs.

The image's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon at interpreter start, so plain env vars are not enough —
we must override via jax.config before the first backend initialization.
All multi-device/sharding tests run on these virtual CPU devices; the real
TPU is reserved for bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
