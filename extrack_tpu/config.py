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
if jax.config.jax_compilation_cache_dir is None:
    _cache = os.environ.get("EXTRACK_TPU_COMPILE_CACHE",
                            os.path.expanduser("~/.cache/extrack_tpu_jax"))
    if _cache and _cache != "0":
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
