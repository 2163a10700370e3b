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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_maps():
    """Evict compiled executables between test modules.

    Every XLA:CPU executable (jitted programs AND each eager-op
    mini-program) stays resident for the process lifetime and costs ~3
    anonymous mappings; a full-suite run accumulates >20k executables,
    crosses the kernel's vm.max_map_count (65530 by default), and the
    next native mmap failure surfaces as a segfault somewhere inside
    compile/serialize (observed three times at ~2/3 of the suite, in
    three different spots).  Clearing per module bounds the map count at
    the largest single module's program set; cross-module recompiles are
    minor (modules rarely share program shapes) and the persistent cache
    absorbs most of them anyway."""
    yield
    jax.clear_caches()
