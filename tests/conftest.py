"""Test configuration: force an 8-device virtual CPU mesh for all tests.

Sharding/parallel tests need multiple devices; unit tests are CPU-friendly and avoid
occupying the (single) real TPU chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: first-compile of the larger jitted graphs is slow on
# the 2-vCPU host; cached compiles make repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
