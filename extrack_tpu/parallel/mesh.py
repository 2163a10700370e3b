"""Multi-chip data parallelism over a 1-D device mesh.

The reference parallelizes with a fork pool mapping track chunks to CPU
workers and summing per-chunk log likelihoods on the host
(extrack/tracking.py:33-39,1061-1069).  The TPU-native equivalent: tracks
shard over a ``data`` mesh axis, every chip runs the same scan kernel on its
shard, and a single ``psum`` over ICI reduces the scalar log likelihood
(SURVEY.md section 2, "Parallelism & distribution").  Model tables are tiny
(<= a few KB) and replicate.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from extrack_tpu import data as tdata
from extrack_tpu.core import engine
from extrack_tpu.core.tables import ModelTables

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D data-parallel mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(batch: tdata.TrackBatch, mesh: Mesh) -> tdata.TrackBatch:
    """Pad the batch to a multiple of the mesh size and shard its track axis.

    Padded tracks have length 0 and contribute exactly zero to likelihoods,
    so sharding never changes results.
    """
    n = mesh.devices.size
    b = batch.batch_size
    batch = batch.pad_batch_to(int(np.ceil(b / n)) * n)
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        return None if x is None else jax.device_put(x, sharding)

    out = tdata.TrackBatch(*(put(c) for c in batch.tree_flatten()[0]))
    cached = getattr(batch, "np_lengths", None)
    if cached is not None:   # keep drivers off the device->host path
        out.np_lengths = cached
    return out


def table_specs(tables: ModelTables, batch_size: int) -> ModelTables:
    """Per-leaf PartitionSpecs for ModelTables under a data mesh.

    Model tables are tiny and replicate — except per-track leaves: per-peak
    ``loc_err2 (B, T, D)`` and per-track-dt ``sig2 (B, Tm1, P)`` carry the
    batch axis and must shard with the tracks (they are built from the
    already-sharded batch in fit.make_objective).
    """
    def _leaf(x):
        if x.ndim == 3 and x.shape[0] == batch_size:
            return P(DATA_AXIS, None, None)
        return P()

    return ModelTables(
        log_trans=P(), log_frac=P(), sig2=_leaf(tables.sig2),
        log_survive=P(), end_ll=P(), loc_err2=_leaf(tables.loc_err2))


def sharded_log_likelihood(batch: tdata.TrackBatch, tables: ModelTables,
                           *, window: int = 6, nb_substeps: int = 1,
                           min_len: int = 3,
                           mesh: Optional[Mesh] = None,
                           compute_engine: str = "xla",
                           has_len2: bool = True) -> jnp.ndarray:
    """Total logL with tracks sharded over the data axis, psum over ICI.

    Works under jit/grad: with sharded inputs, XLA partitions the scan and
    inserts the reduction collective automatically (GSPMD); the explicit
    shard_map path is used when a mesh is passed for strict control.
    Per-track model tables (per-peak loc_err2, per-track-dt sig2) shard with
    the data; everything else replicates.

    compute_engine='pallas' runs the VMEM-resident custom-VJP kernel on
    each chip's shard (value and gradient both differentiable through the
    psum) — the per-chip hot loop of a multi-chip fit.
    """
    if mesh is None:
        return jnp.sum(engine.forward(
            batch.positions, batch.lengths, batch.is_bleached, tables,
            window=window, nb_substeps=nb_substeps, min_len=min_len))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  table_specs(tables, batch.positions.shape[0])),
        out_specs=P(), check_vma=False)
    def shard_fn(pos, lengths, isbl, tb):
        if compute_engine == "pallas":
            from extrack_tpu.ops import pallas_grad
            local = -pallas_grad.neg_log_likelihood(
                pos, lengths, isbl, tb, window=window,
                nb_substeps=nb_substeps, min_len=min_len,
                has_len2=has_len2)
        else:
            local = jnp.sum(engine.forward(
                pos, lengths, isbl, tb,
                window=window, nb_substeps=nb_substeps, min_len=min_len))
        return jax.lax.psum(local, DATA_AXIS)

    return shard_fn(batch.positions, batch.lengths, batch.is_bleached, tables)


def sharded_posteriors(batch: tdata.TrackBatch, tables: ModelTables, *,
                       window: int = 5, min_len: int = 3, mesh: Mesh,
                       compute_engine: str = "xla"):
    """(logl (B,), preds (B, T, S)) with tracks sharded over the data axis.

    Per-track outputs need no collective — they stay sharded like their
    inputs (the reference parallelizes annotation over its fork pool the
    same way, extrack/tracking.py:890-896).  compute_engine='pallas' runs
    the VMEM posterior kernel on each chip's shard.
    """
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  table_specs(tables, batch.positions.shape[0])),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False)
    def shard_fn(pos, lengths, isbl, tb):
        if compute_engine == "pallas":
            from extrack_tpu.ops import pallas_predict
            return pallas_predict.predict_pallas(
                pos, lengths, isbl, tb, window=window, min_len=min_len,
                interpret=jax.default_backend() != "tpu")
        return engine.forward(pos, lengths, isbl, tb, window=window,
                              min_len=min_len, return_preds=True)

    return shard_fn(batch.positions, batch.lengths, batch.is_bleached,
                    tables)


def sharded_histogram(batch: tdata.TrackBatch, tables: ModelTables, *,
                      window: int = 7, min_len: int = 3, mesh: Mesh,
                      compute_engine: str = "xla", nb_substeps: int = 1):
    """(T, S) duration histogram: per-shard histograms psum over ICI
    (the reference reduces per-chunk histograms the same way,
    extrack/histograms.py:360-367)."""
    from extrack_tpu import histograms

    if compute_engine == "pallas" and nb_substeps != 1:
        raise NotImplementedError(
            "the histogram kernel supports nb_substeps=1 only")

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  table_specs(tables, batch.positions.shape[0])),
        out_specs=P(), check_vma=False)
    def shard_fn(pos, lengths, isbl, tb):
        if compute_engine == "pallas":
            from extrack_tpu.ops import pallas_hist
            local = pallas_hist.hist_pallas(
                pos, lengths, isbl, tb, window=window, min_len=min_len,
                interpret=jax.default_backend() != "tpu")
        else:
            local = histograms.window_segment_histogram(
                pos, lengths, isbl, tb, window=window, min_len=min_len,
                nb_substeps=nb_substeps)
        return jax.lax.psum(local, DATA_AXIS)

    return shard_fn(batch.positions, batch.lengths, batch.is_bleached,
                    tables)


def sharded_refine(positions, lengths, loc_err2, log_trans, sig2_states, *,
                   window: int = 7, mesh: Mesh,
                   compute_engine: str = "xla"):
    """(mu (B,T,D), sigma (B,T,D)) with tracks sharded over the data axis.
    ``loc_err2`` shards with the tracks when per-peak (B, T, D),
    replicates otherwise."""
    from extrack_tpu import refine as trefine

    B = positions.shape[0]
    le_spec = (P(DATA_AXIS, None, None)
               if loc_err2.ndim == 3 and loc_err2.shape[0] == B else P())

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), le_spec, P(), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False)
    def shard_fn(pos, lens, le2, lt, s2):
        if compute_engine == "pallas":
            from extrack_tpu.ops import pallas_refine
            return pallas_refine.refine_pallas(
                pos, lens, le2, lt, s2, window=window,
                interpret=jax.default_backend() != "tpu")
        return trefine.refine_positions(pos, lens, le2, lt, s2,
                                        window=window)

    return shard_fn(positions, lengths, loc_err2, log_trans, sig2_states)
