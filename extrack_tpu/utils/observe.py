"""Observability: fit metrics, structured logs, profiler hooks, checkpoints.

The reference's only observability is ``print`` of per-iteration values and
``.``/``x`` progress glyphs (extrack/tracking.py:1072-1086); checkpointing is
manual np.save of parameters (Tutorials/automated_fitting.py:85).  Here:

* ``FitRecorder`` — per-evaluation records (objective, parameters, wall
  time), optional JSONL sink, usable as the ``callback`` of fit.fit;
* ``trace`` — context manager around ``jax.profiler`` for TPU traces;
* ``CheckpointManager`` — atomic JSON checkpoints of (parameters, objective,
  evaluation count) with resume support; the fit driver saves on every
  improvement so an interrupted fit warm-restarts from its best point.
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import tempfile
import time
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class FitRecord:
    n_eval: int
    objective: float
    values: Dict[str, float]
    wall_time: float


class FitRecorder:
    """Collects per-evaluation fit metrics; optionally appends JSONL."""

    def __init__(self, jsonl_path: Optional[str] = None,
                 print_every: int = 0):
        self.records: List[FitRecord] = []
        self.jsonl_path = jsonl_path
        self.print_every = print_every
        self._t0 = time.perf_counter()

    def __call__(self, n_eval: int, objective: float,
                 values: Dict[str, float]):
        rec = FitRecord(n_eval, float(objective),
                        {k: float(np.asarray(v)) for k, v in values.items()
                         if np.ndim(v) == 0},
                        time.perf_counter() - self._t0)
        self.records.append(rec)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as fh:
                fh.write(json.dumps(dataclasses.asdict(rec)) + "\n")
        if self.print_every and n_eval % self.print_every == 0:
            print(f"[fit {n_eval:>4}] -logL={objective:.4f} "
                  f"t={rec.wall_time:.1f}s")

    @property
    def best(self) -> Optional[FitRecord]:
        return min(self.records, key=lambda r: r.objective, default=None)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/extrack_tpu_trace"):
    """Profile a region with the JAX/TPU profiler (view with XProf)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class CheckpointManager:
    """Atomic JSON checkpoints of fit state with resume."""

    def __init__(self, path: str):
        self.path = path

    def save(self, values: Dict[str, float], objective: float,
             n_eval: int, extra: Optional[dict] = None):
        payload = {"values": {k: float(np.asarray(v))
                              for k, v in values.items() if np.ndim(v) == 0},
                   "objective": float(objective), "n_eval": int(n_eval),
                   "extra": extra or {}}
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt")
        with os.fdopen(fd, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, self.path)

    def load(self) -> Optional[dict]:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as fh:
            return json.load(fh)
