"""Multi-host input pipeline: per-process track loading onto a global mesh.

The reference's only parallelism is a single-host fork pool
(extrack/tracking.py:33-39); there is no multi-host story to port.  For pod
slices, the TPU-native pattern is: every host process loads ONLY its own
slice of the dataset (readers or simulator), places it on its local devices,
and the per-process shards assemble into one global jax.Array over the data
mesh — DCN never carries track data, only the scalar psum of the fit loop
(ICI within a slice).

Degenerate single-process behavior equals parallel.mesh.shard_batch, so the
same code path runs everywhere; tested both single-process and with two
jax.distributed CPU processes (tests/test_multihost_procs.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from extrack_tpu import data as tdata
from extrack_tpu.parallel.mesh import DATA_AXIS


def global_mesh() -> Mesh:
    """1-D data mesh over ALL devices of the run (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (DATA_AXIS,))


def process_slice(n_items: int,
                  process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> slice:
    """The half-open range of dataset items this host process should load.

    Balanced contiguous split; use it to subset file lists or row ranges
    BEFORE reading, so each host touches only its own bytes.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base, extra = divmod(n_items, pc)
    start = pi * base + min(pi, extra)
    return slice(start, start + base + (1 if pi < extra else 0))


def split_paths(paths: Sequence[str]) -> Sequence[str]:
    """Subset a file list to this process's share (read only your slice)."""
    return list(paths)[process_slice(len(paths))]


def global_batch(local: tdata.TrackBatch,
                 mesh: Optional[Mesh] = None) -> tdata.TrackBatch:
    """Assemble per-process local TrackBatches into one global sharded batch.

    ``local`` holds THIS process's tracks (padded to a common max_len across
    processes — use a fixed bucket layout so shapes agree).  Each process's
    rows land on its local devices via
    ``jax.make_array_from_process_local_data``; the result is one global
    jax.Array sharded over the data axis, directly usable by
    fit.make_objective / parallel.mesh.sharded_log_likelihood.
    """
    mesh = mesh or global_mesh()
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    n_local_dev = max(1, len(mesh.local_devices))
    b = local.batch_size
    # every process must pad to the SAME local row count, or the inferred
    # global shapes disagree across hosts and the SPMD program diverges
    # (an uneven process_slice split makes local batch sizes differ by 1)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        b = int(np.max(multihost_utils.process_allgather(np.int64(b))))
    local = local.pad_batch_to(int(np.ceil(b / n_local_dev)) * n_local_dev)

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    out = tdata.TrackBatch(*(put(c) for c in local.tree_flatten()[0]))
    # host-side GLOBAL lengths cache: min_len / has_len2 are static program
    # arguments, so every process must derive them from the same array (and
    # host_lengths on a non-fully-addressable global array would crash)
    lens_local = tdata.host_lengths(local)   # cached: no device->host pull
    if jax.process_count() > 1:
        out.np_lengths = np.concatenate(
            list(multihost_utils.process_allgather(lens_local)))
    else:
        out.np_lengths = lens_local
    return out
