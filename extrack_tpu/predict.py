"""Per-position state posterior annotation.

Equivalent of the reference predict_Bs (extrack/tracking.py:792-906): runs
the likelihood engine with posterior accumulation and returns, per track, the
probability of each localization being in each state.  Where the reference
chunks one track at a time through a fork pool (nb_max=1, tracking.py:803),
everything here is one batched scan (a VMEM-resident Pallas kernel on TPU).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from extrack_tpu import data as tdata
from extrack_tpu import params as tparams
from extrack_tpu.core import engine, tables


@functools.partial(
    jax.jit,
    static_argnames=("nb_states", "cell_dims", "window", "min_len",
                     "matrix_type", "nb_substeps", "return_preds"))
def forward_from_values(values, positions, lengths, is_bleached,
                        loc_err_in, dt_arr, *, nb_states, cell_dims,
                        window, min_len, matrix_type=1, nb_substeps=1,
                        return_preds=True):
    """Parameter extraction + table build + scan engine in ONE jit.

    Eager table building costs seconds per op through the TPU tunnel
    (CLAUDE.md); fusing it into the compiled program makes driver calls a
    single dispatch.  ``values`` is the resolved parameter dict (a pytree
    of scalars); ``loc_err_in`` is the per-peak error batch or None.
    """
    Ds, Fs, rates, loc_err, pBL = tparams.extract_arrays(
        values, nb_states, input_loc_err=loc_err_in)
    tb = tables.build_tables(Ds, loc_err, Fs, rates, pBL, dt_arr,
                             cell_dims=cell_dims, nb_substeps=nb_substeps,
                             matrix_type=matrix_type)
    return engine.forward(positions, lengths, is_bleached, tb,
                          window=window, nb_substeps=nb_substeps,
                          min_len=min_len, return_preds=return_preds)


def predict_batch(batch: tdata.TrackBatch,
                  spec_or_values,
                  dt,
                  nb_states: int,
                  cell_dims=(1.0,),
                  window: int = 5,
                  min_len: Optional[int] = None,
                  matrix_type: int = 1,
                  input_loc_err: bool = False,
                  chunk_size: int = 16384,
                  compute_engine: str = "auto",
                  sharded: bool = False):
    """(logl (B,), preds (B, T, S)) for a TrackBatch.

    The posterior scan carries per-track history (~K*T*S floats per track in
    fast memory), so large batches process in ``chunk_size`` chunks — one
    compiled program reused across chunks (vs the reference's nb_max=1
    single-track chunks, extrack/tracking.py:803).

    compute_engine: 'auto' uses the VMEM-resident Pallas posterior kernel
    on TPU (per-peak LocErr and per-step/per-track dt included);
    'xla'/'pallas' force a path.  ``sharded=True`` shards the batch over a
    1-D data mesh of all available devices and runs the (Pallas or XLA)
    posterior per shard — per-track outputs need no collective
    (parallel.mesh.sharded_posteriors; the reference parallelizes
    annotation over its fork pool too, extrack/tracking.py:890-896).
    """
    values = (spec_or_values.resolve()
              if isinstance(spec_or_values, tparams.Parameters)
              else spec_or_values)
    if min_len is None:
        lens = tdata.host_lengths(batch)
        min_len = tdata.default_min_len(lens)
    if sharded:
        from extrack_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh()
        B = batch.batch_size
        batch = pmesh.shard_batch(batch, mesh)
        dt_arr = batch.dt if batch.dt is not None else jnp.asarray(dt)
        use_pallas = (compute_engine in ("auto", "pallas")
                      and jax.default_backend() == "tpu")
        if use_pallas:
            # same eligibility gate as the non-sharded auto path: shapes
            # whose posterior history exceeds the kernel's VMEM budget
            # fall back to the XLA scan instead of crashing per shard
            from extrack_tpu.ops import pallas_predict
            try:
                cap = pallas_predict.predict_block_cap(
                    batch.max_len, window, batch.nb_dims,
                    nb_states ** window, nb_states)
            except Exception:
                cap = 0
            if cap < 128:
                use_pallas = False
        logl, preds = _predict_sharded_from_values(
            values, batch.positions, batch.lengths, batch.is_bleached,
            batch.loc_err if input_loc_err else None, dt_arr,
            nb_states=nb_states, cell_dims=tuple(cell_dims), window=window,
            min_len=min_len, matrix_type=matrix_type, mesh=mesh,
            compute_engine="pallas" if use_pallas else "xla")
        return logl[:B], preds[:B]

    use_pallas = (compute_engine == "pallas"
                  or (compute_engine == "auto"
                      and jax.default_backend() == "tpu"))
    if use_pallas:
        from extrack_tpu.ops import pallas_predict
        try:
            cap = pallas_predict.predict_block_cap(
                batch.max_len, window, batch.nb_dims,
                nb_states ** window, nb_states)
        except Exception:
            cap = 0
        if cap < 128 and compute_engine != "pallas":
            use_pallas = False
    if use_pallas:
        # the VMEM-resident kernel streams per grid block; small chunks
        # only add dispatches and eager concatenates (HBM per 2^20 tracks:
        # ~100MB inputs + ~100MB posteriors)
        chunk_size = max(chunk_size, 1 << 20)

    B = batch.batch_size
    if B > chunk_size:
        # pad to a chunk multiple so every chunk reuses one compilation
        batch = batch.pad_batch_to(int(np.ceil(B / chunk_size))
                                   * chunk_size)
    kw = dict(nb_states=nb_states, cell_dims=tuple(cell_dims),
              window=window, min_len=min_len, matrix_type=matrix_type)
    dt_arr = batch.dt if batch.dt is not None else jnp.asarray(dt)

    def run(sl):
        if use_pallas:
            return _predict_pallas_from_values(
                values, batch.positions[sl], batch.lengths[sl],
                batch.is_bleached[sl],
                batch.loc_err[sl] if input_loc_err else None,
                dt_arr[sl] if dt_arr.ndim > 1 else dt_arr, **kw)
        return forward_from_values(
            values, batch.positions[sl], batch.lengths[sl],
            batch.is_bleached[sl],
            batch.loc_err[sl] if input_loc_err else None,
            dt_arr[sl] if dt_arr.ndim > 1 else dt_arr, **kw)

    if B <= chunk_size:
        return run(slice(None))
    logls, preds = [], []
    for c in range(batch.batch_size // chunk_size):
        out = run(slice(c * chunk_size, (c + 1) * chunk_size))
        logls.append(out[0])
        preds.append(out[1])
    return (jnp.concatenate(logls)[:B], jnp.concatenate(preds)[:B])


@functools.partial(
    jax.jit,
    static_argnames=("nb_states", "cell_dims", "window", "min_len",
                     "matrix_type", "mesh", "compute_engine"))
def _predict_sharded_from_values(values, positions, lengths, is_bleached,
                                 loc_err_in, dt_arr, *, nb_states,
                                 cell_dims, window, min_len, matrix_type,
                                 mesh, compute_engine):
    """Table build + shard_map posterior in one jit (mesh is static)."""
    from extrack_tpu.parallel import mesh as pmesh
    Ds, Fs, rates, loc_err, pBL = tparams.extract_arrays(
        values, nb_states, input_loc_err=loc_err_in)
    tb = tables.build_tables(Ds, loc_err, Fs, rates, pBL, dt_arr,
                             cell_dims=cell_dims, nb_substeps=1,
                             matrix_type=matrix_type)
    b = tdata.TrackBatch(positions, lengths, None, is_bleached)
    return pmesh.sharded_posteriors(b, tb, window=window, min_len=min_len,
                                    mesh=mesh,
                                    compute_engine=compute_engine)


@functools.partial(
    jax.jit,
    static_argnames=("nb_states", "cell_dims", "window", "min_len",
                     "matrix_type"))
def _predict_pallas_from_values(values, positions, lengths, is_bleached,
                                loc_err_in, dt_arr, *, nb_states, cell_dims,
                                window, min_len, matrix_type=1):
    """Table build + Pallas posterior kernel in one jit.  Per-peak LocErr
    and per-step/per-track dt stream through the kernel's l2 / sig2
    tables (ops.pallas_predict)."""
    from extrack_tpu.ops import pallas_predict
    Ds, Fs, rates, loc_err, pBL = tparams.extract_arrays(
        values, nb_states, input_loc_err=loc_err_in)
    tb = tables.build_tables(Ds, loc_err, Fs, rates, pBL, dt_arr,
                             cell_dims=cell_dims, nb_substeps=1,
                             matrix_type=matrix_type)
    return pallas_predict.predict_pallas(
        positions, lengths, is_bleached, tb, window=window,
        min_len=min_len, interpret=jax.default_backend() != "tpu")


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
               nb_max: int = 1,
               sharded: bool = False) -> Dict[str, np.ndarray]:
    """Reference-compatible wrapper (extrack/tracking.py:792-906).

    ``workers``/``nb_max``/``threshold``/``max_nb_states`` are accepted for
    API compatibility; the fixed window (``frame_len``) replaces threshold
    pruning and the whole dataset runs as one batched scan.
    ``sharded=True`` shards the batch over the device mesh (like the other
    drivers' flag).
    """
    del max_nb_states, threshold, workers, verbose, nb_max
    batch = tdata.from_dict(all_tracks, input_loc_err=input_LocErr,
                            dt=dt if isinstance(dt, dict) else None)
    _, preds = predict_batch(
        batch, params, dt if not isinstance(dt, dict) else 0.0, nb_states,
        cell_dims=cell_dims, window=frame_len,
        input_loc_err=input_LocErr is not None, sharded=sharded)
    return tdata.to_dict(batch, np.asarray(preds))
