"""Test configuration: force CPU JAX with 8 virtual devices.

Must run before the first ``import jax`` anywhere in the test session so the
distributed tests can build a multi-device ``jax.sharding.Mesh`` without TPU
hardware (SURVEY.md §4 item 4).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-registers a TPU backend regardless of
# JAX_PLATFORMS in the environment; override in-process (must happen before
# the first jax.devices() call anywhere in the session).
# VOLREND_TPU_TESTS=1 keeps the real TPU backend instead — ONLY for the
# self-skipping Mosaic lowering smoke tests:
#   VOLREND_TPU_TESTS=1 pytest tests/test_tpu_smoke.py -q
# (the rest of the suite needs the 8 virtual CPU devices and will fail).
import jax  # noqa: E402

if os.environ.get("VOLREND_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
