"""Global configuration for extrack-tpu.

The reference package (extrack/tracking.py:18-26) switches between NumPy and
CuPy with a module-level ``GPU_computing`` flag.  Here the accelerator is
implicit (JAX backend); the only global knobs are numerical precision and
default engine sizes.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class EngineConfig:
    """Static configuration of the likelihood engine.

    window: number of hidden sub-step states kept exactly (the register holds
        ``nb_states**window`` state sequences).  Equivalent to the reference's
        ``frame_len`` (extrack/tracking.py:109,1323).
    nb_substeps: hidden transition sub-steps per frame
        (extrack/tracking.py:1322).
    min_len: first frame index (1-based ``current_step``) at which survival
        terms are applied; the reference uses the minimum track length of the
        dataset (extrack/tracking.py:1009,233-236).
    """

    window: int = 6
    nb_substeps: int = 1
    min_len: int = 3
    stop_gradient_survival: bool = False


def default_dtype():
    # Follows jax_enable_x64: float64 on CPU test rigs, float32 on TPU.
    return jnp.zeros(0).dtype
