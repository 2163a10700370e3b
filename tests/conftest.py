"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Numerical parity tests against the exact-enumeration oracle require float64;
multi-chip sharding tests use the virtual CPU mesh.  Benchmarks (bench.py)
run separately on real TPU hardware in float32.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
