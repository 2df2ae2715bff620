"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on host CPU devices
(xla_force_host_platform_device_count), mirroring how the driver dry-runs
the multichip path. The axon TPU plugin registers itself from sitecustomize
before conftest runs, so the platform must be overridden via jax.config
(env vars alone are too late).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
