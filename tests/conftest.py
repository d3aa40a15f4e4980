"""Test configuration: force an 8-virtual-device CPU platform.

Per SURVEY.md §4: multi-chip logic is validated on a single host with
XLA_FLAGS=--xla_force_host_platform_device_count=8 — the standard JAX
substitute for a real pod slice. Must run before jax is imported anywhere.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep pallas kernels interpretable on CPU tests.
os.environ.setdefault("JAX_PALLAS_INTERPRET", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The axon TPU plugin ignores JAX_PLATFORMS; pin computation to CPU devices
# so tests are hermetic and fast (and use the 8 virtual devices for meshes).
jax.config.update("jax_default_device", jax.devices("cpu")[0])
