"""Per-position state posterior annotation.

Equivalent of the reference predict_Bs (extrack/tracking.py:792-906): runs
the likelihood engine with posterior accumulation and returns, per track, the
probability of each localization being in each state.  Where the reference
chunks one track at a time through a fork pool (nb_max=1, tracking.py:803),
everything here is one batched scan — vmapped over tracks, sharded over chips.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp

from extrack_tpu import data as tdata
from extrack_tpu import params as tparams
from extrack_tpu.core import engine, tables


def predict_batch(batch: tdata.TrackBatch,
                  spec_or_values,
                  dt,
                  nb_states: int,
                  cell_dims=(1.0,),
                  window: int = 5,
                  min_len: Optional[int] = None,
                  matrix_type: int = 1,
                  input_loc_err: bool = False):
    """(logl (B,), preds (B, T, S)) for a TrackBatch."""
    values = (spec_or_values.resolve()
              if isinstance(spec_or_values, tparams.Parameters)
              else spec_or_values)
    Ds, Fs, rates, loc_err, pBL = tparams.extract_arrays(
        values, nb_states,
        input_loc_err=batch.loc_err if input_loc_err else None)
    dt_arr = batch.dt if batch.dt is not None else jnp.asarray(dt)
    tb = tables.build_tables(Ds, loc_err, Fs, rates, pBL, dt_arr,
                             cell_dims=cell_dims, nb_substeps=1,
                             matrix_type=matrix_type)
    if min_len is None:
        lens = np.asarray(batch.lengths)
        min_len = int(lens[lens >= 2].min()) if (lens >= 2).any() else 2
    return engine.forward(batch.positions, batch.lengths, batch.is_bleached,
                          tb, window=window, nb_substeps=1, min_len=min_len,
                          return_preds=True)


def predict_Bs(all_tracks: Dict[str, np.ndarray],
               dt,
               params,
               cell_dims=(1.0,),
               nb_states: int = 2,
               frame_len: int = 5,
               max_nb_states: int = 200,
               threshold: float = 0.1,
               workers: int = 1,
               input_LocErr=None,
               verbose: int = 0,
               nb_max: int = 1) -> Dict[str, np.ndarray]:
    """Reference-compatible wrapper (extrack/tracking.py:792-906).

    ``workers``/``nb_max``/``threshold``/``max_nb_states`` are accepted for
    API compatibility; the fixed window (``frame_len``) replaces threshold
    pruning and the whole dataset runs as one batched scan.
    """
    del max_nb_states, threshold, workers, verbose, nb_max
    batch = tdata.from_dict(all_tracks, input_loc_err=input_LocErr,
                            dt=dt if isinstance(dt, dict) else None)
    _, preds = predict_batch(
        batch, params, dt if not isinstance(dt, dict) else 0.0, nb_states,
        cell_dims=cell_dims, window=frame_len,
        input_loc_err=input_LocErr is not None)
    return tdata.to_dict(batch, np.asarray(preds))
