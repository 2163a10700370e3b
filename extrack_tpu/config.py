"""Global configuration for extrack-tpu.

The reference package (extrack/tracking.py:18-26) switches between NumPy and
CuPy with a module-level ``GPU_computing`` flag.  Here the accelerator is
implicit (JAX backend); the only global knobs are numerical precision and
default engine sizes.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Persistent compilation cache: TPU programs here compile remotely
# (100-300 s for a new program shape through the tunnel); caching the
# serialized executables on disk makes every later process start warm.
def _cpu_cache_fingerprint() -> str:
    """Host-CPU identity hash for the CPU cache path.

    Cached XLA:CPU AOT executables embed the COMPILE host's machine
    features; loading them on a host with a different feature set (the
    cache directory outliving the VM it was written on) makes the loader
    warn "could lead to execution errors such as SIGILL" — and
    intermittently deliver exactly that (observed: flaky aborts inside a
    jitted objective under scipy L-BFGS).  Partitioning the CPU cache by
    host identity sidesteps it; TPU executables are target-compiled and
    stay shared."""
    import hashlib
    import platform

    txt = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                key = line.split(":")[0].strip()
                if key in ("model name", "flags") and key not in seen:
                    seen.add(key)
                    txt.append(line.strip())
                if len(seen) == 2:
                    break
    except OSError:
        pass
    return hashlib.sha1("\n".join(txt).encode()).hexdigest()[:12]


def cpu_cache_dir(base: str) -> str:
    return f"{base}_cpu_{_cpu_cache_fingerprint()}"


_base_cache = None
if jax.config.jax_compilation_cache_dir is None:
    _cache = os.environ.get("EXTRACK_TPU_COMPILE_CACHE",
                            os.path.expanduser("~/.cache/extrack_tpu_jax"))
    _base_cache = _cache if _cache and _cache != "0" else None
    if _cache and _cache != "0":
        # CPU-primary processes (test rig, examples forcing CPU) get the
        # host-fingerprinted directory; accelerator/unknown keep the
        # shared one (remote-compiled TPU programs are host-independent
        # and re-warming them costs 100-300 s each).
        if ("EXTRACK_TPU_COMPILE_CACHE" not in os.environ
                and str(jax.config.jax_platforms
                        or os.environ.get("JAX_PLATFORMS", "")
                        ).split(",")[0].strip() == "cpu"):
            _cache = cpu_cache_dir(_cache)
        jax.config.update("jax_compilation_cache_dir", _cache)
        # On TPU, cache EVERY program: through the remote-compile tunnel
        # even a trivial eager op costs a multi-second helper roundtrip and
        # a data-pipeline call dispatches dozens of distinct small programs
        # (a 10^6-track sim_fov_batch went 225s -> 19s per fresh process).
        # On CPU the default 1s threshold stands — local compiles are fast
        # and cached CPU AOT executables warn about host-feature mismatches.
        _plat = str(jax.config.jax_platforms
                    or os.environ.get("JAX_PLATFORMS", ""))
        # primary platform only: accelerator plugins register with a CPU
        # fallback ('axon,cpu'), which must still count as accelerator
        _primary = _plat.split(",")[0].strip()
        if _primary not in ("cpu", ""):
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              -1)

# Keep Python caller frames OUT of MLIR locations.  The Mosaic kernel
# payload (the tpu_custom_call backend_config) embeds its module's location
# metadata, including the USER's call-site file:line chain.  JAX strips
# locations from the outer StableHLO when computing the persistent-cache
# key, but the payload is an opaque string attribute — so with the default
# limit of 10 frames, calling the same fit from a different script (or a
# different line) changes the cache key and forces a full remote recompile
# (~600 s for the Pallas value_and_grad program through the tunnel).  With
# the limit at 0 the payload is byte-stable across call sites and
# processes.  Python exception tracebacks are unaffected; only MLIR debug
# locations lose user frames.
jax.config.update("jax_traceback_in_locations_limit", 0)

def use_cpu_cache():
    """Re-point the persistent cache at the host-fingerprinted CPU
    directory.  For processes that force the CPU backend AFTER importing
    extrack_tpu (e.g. __graft_entry__.dryrun_multichip): the import-time
    gate saw an accelerator/unknown platform and left the shared
    directory, whose stale foreign-host CPU AOT entries can SIGILL."""
    if (_base_cache is not None
            and jax.config.jax_compilation_cache_dir == _base_cache):
        jax.config.update("jax_compilation_cache_dir",
                          cpu_cache_dir(_base_cache))


_cache_tuned = False


def ensure_cache_tuning():
    """Apply the cache-every-program tuning once the backend is known.

    When an accelerator plugin auto-registers (no JAX_PLATFORMS set,
    jax_platforms unset) the import-time gate above can't tell CPU from
    accelerator; drivers call this after first backend touch, where
    ``jax.default_backend()`` is cheap and authoritative."""
    global _cache_tuned
    if _cache_tuned:
        return
    _cache_tuned = True
    if (jax.config.jax_compilation_cache_dir
            and jax.default_backend() not in ("cpu",)):
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def default_dtype():
    # Follows jax_enable_x64: float64 on CPU test rigs, float32 on TPU.
    return jnp.zeros(0).dtype
