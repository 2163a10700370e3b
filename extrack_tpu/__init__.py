"""extrack-tpu: TPU-native single-particle-tracking state inference.

A from-scratch JAX/XLA re-design of the capabilities of ExTrack
(vanTeeffelenLab/ExTrack): maximum-likelihood fitting of multi-state
diffusion models on localization tracks, per-position state posteriors,
state-duration histograms, position refinement, track simulation, and I/O —
built around a fixed-width sequence-register scan engine that runs fused on
TPU and shards over device meshes.
"""
from extrack_tpu.version import __version__  # noqa: F401
from extrack_tpu import config, data, params, simulate  # noqa: F401
from extrack_tpu import fit, predict, tracking, parallel  # noqa: F401
from extrack_tpu.core import engine, gaussian, oracle, tables  # noqa: F401
