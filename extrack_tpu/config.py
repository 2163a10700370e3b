"""Global configuration for extrack-tpu.

The reference package (extrack/tracking.py:18-26) switches between NumPy and
CuPy with a module-level ``GPU_computing`` flag.  Here the accelerator is
implicit (JAX backend); the only global knobs are numerical precision and
default engine sizes.
"""
from __future__ import annotations

import jax.numpy as jnp


def default_dtype():
    # Follows jax_enable_x64: float64 on CPU test rigs, float32 on TPU.
    return jnp.zeros(0).dtype
