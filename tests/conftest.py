"""Test configuration: force an 8-device virtual CPU mesh for all tests.

Sharding/parallel tests need multiple devices; unit tests are CPU-friendly and must not
occupy the (single) real TPU chip. NOTE: with the axon TPU plugin, the JAX_PLATFORMS
env var is ignored — the platform must be forced via jax.config before backend init.
"""

import os

# Persistent compilation cache: first-compile of the larger jitted graphs is slow on
# the 2-vCPU host; cached compiles make repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
