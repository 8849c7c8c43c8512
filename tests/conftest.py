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

# Persistent compilation cache: the quick tier is compile-dominated (dozens
# of jitted train/eval programs at tiny shapes), and the cache is keyed by
# HLO hash so it is always-correct. First run pays full compile; repeat CI
# runs of unchanged programs skip XLA entirely (quick-tier budget,
# VERDICT r4 #6).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
