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
from extrack_tpu import histograms, pipeline, sample  # noqa: F401
from extrack_tpu.core import engine, gaussian, oracle, tables  # noqa: F401

# reference-compatible module names (extrack/__init__.py:1-10)
from extrack_tpu import refine as refined_localization  # noqa: F401
from extrack_tpu import simulate as simulate_tracks  # noqa: F401
from extrack_tpu.io import exporters, readers  # noqa: F401

_LAZY = {"visualization": "extrack_tpu.visualization",  # needs matplotlib
         "gui": "extrack_tpu.gui",                      # needs tkinter
         "auto_fitting": "extrack_tpu.auto_fitting",
         "cli": "extrack_tpu.cli"}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        return importlib.import_module(_LAZY[name])
    raise AttributeError(f"module 'extrack_tpu' has no attribute {name!r}")
