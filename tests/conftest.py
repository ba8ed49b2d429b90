"""Test configuration: force an 8-device virtual CPU mesh for all tests.

Sharding/parallel tests need multiple devices; unit tests are CPU-friendly and avoid
occupying the (single) real TPU chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
