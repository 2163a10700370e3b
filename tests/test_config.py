"""Guards on the import-time JAX configuration in extrack_tpu.config.

These settings exist to keep the remote-TPU persistent compilation cache
effective; regressing them silently re-introduces multi-minute cold starts.
"""
import jax

import extrack_tpu  # noqa: F401  (import applies config)


def test_no_user_frames_in_mlir_locations():
    # The Mosaic kernel payload (tpu_custom_call backend_config) embeds its
    # module's MLIR location metadata, including the user's call-site
    # file:line chain.  JAX strips locations from the outer StableHLO when
    # computing the persistent-cache key, but the payload is an opaque
    # string attribute — with the default limit of 10 frames the cache key
    # changes with every calling script, forcing a full remote recompile
    # (~600 s observed for the Pallas value_and_grad program).
    assert jax.config.jax_traceback_in_locations_limit == 0


def test_compilation_cache_configured():
    assert jax.config.jax_compilation_cache_dir


def test_cpu_cache_dir_is_host_fingerprinted():
    # Cached XLA:CPU AOT executables embed the compile host's machine
    # features; loading an entry written by a different host intermittently
    # SIGILLs/aborts (observed under scipy L-BFGS in the test suite when
    # the cache directory outlived the VM that wrote it).  CPU-primary
    # processes must therefore use a host-fingerprinted directory, never
    # the shared TPU one.
    from extrack_tpu import config

    d = jax.config.jax_compilation_cache_dir
    assert d and "_cpu_" in d
    assert d == config.cpu_cache_dir(config._base_cache)
    # the fingerprint is stable within a host
    assert config.cpu_cache_dir("x") == config.cpu_cache_dir("x")
