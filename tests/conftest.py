"""Test configuration: run every test on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per the driver contract the
DP/TP shardings are exercised on host platform devices
(``--xla_force_host_platform_device_count=8``).  The axon TPU tunnel in this
environment ignores the ``JAX_PLATFORMS`` env var, so the platform is forced
programmatically before any computation runs.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# fp32 tests compare against torch: keep matmuls at full precision
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
