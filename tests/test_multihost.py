"""Multi-host input pipeline, exercised in its single-process degenerate
configuration (an 8-device virtual mesh; real pods add processes, not code
paths — every host runs exactly this)."""
import numpy as np

import jax
import jax.numpy as jnp

from extrack_tpu import data as tdata, simulate
from extrack_tpu.core import tables
from extrack_tpu.parallel import mesh as pmesh, multihost


def test_process_slice_partitions_exactly():
    for n, pc in [(10, 4), (7, 3), (3, 8), (100, 8)]:
        slices = [multihost.process_slice(n, pi, pc) for pi in range(pc)]
        items = [i for s in slices for i in range(n)[s]]
        assert items == list(range(n))          # disjoint, ordered, complete


def test_split_paths_single_process():
    paths = [f"f{i}.csv" for i in range(5)]
    assert multihost.split_paths(paths) == paths    # 1 process -> all files


def test_global_batch_matches_shard_batch():
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=100, max_track_len=9, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, .1], [.1, .9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=17)
    batch = tdata.from_dict(tracks)
    gb = multihost.global_batch(batch)
    assert gb.batch_size % 8 == 0
    tb = tables.build_tables(np.array([0.0, 0.08]), 0.02,
                             np.array([0.5, 0.5]),
                             np.array([[0.0, 0.1], [0.1, 0.0]]), 0.05, 0.02,
                             cell_dims=(0.5,))
    mesh = multihost.global_mesh()
    logl = float(pmesh.sharded_log_likelihood(gb, tb, window=4, min_len=3,
                                              mesh=mesh))
    ref = float(pmesh.sharded_log_likelihood(batch, tb, window=4, min_len=3))
    np.testing.assert_allclose(logl, ref, rtol=1e-12)
