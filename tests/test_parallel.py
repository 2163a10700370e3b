"""Multi-chip sharding: sharded psum logL must equal single-chip logL."""
import numpy as np

import jax
import jax.numpy as jnp

from extrack_tpu import data as tdata, simulate
from extrack_tpu.core import tables
from extrack_tpu.parallel import mesh as pmesh


def _setup():
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=120, max_track_len=9, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]),
        dt=0.02, pBL=0.05, cell_dims=(0.5, None, None), seed=11)
    batch = tdata.from_dict(tracks)
    tb = tables.build_tables(np.array([0.0, 0.08]), 0.02,
                             np.array([0.5, 0.5]),
                             np.array([[0.0, 0.1], [0.1, 0.0]]), 0.05, 0.02,
                             cell_dims=(0.5,))
    return batch, tb


def test_sharded_equals_single_chip():
    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    batch, tb = _setup()
    single = float(pmesh.sharded_log_likelihood(batch, tb, window=4,
                                                min_len=3))
    mesh = pmesh.make_mesh()
    sharded = pmesh.shard_batch(batch, mesh)
    assert sharded.batch_size % 8 == 0
    multi = float(pmesh.sharded_log_likelihood(sharded, tb, window=4,
                                               min_len=3, mesh=mesh))
    np.testing.assert_allclose(multi, single, rtol=1e-12)


def test_gradient_through_shard_map():
    batch, tb = _setup()
    mesh = pmesh.make_mesh()
    sharded = pmesh.shard_batch(batch, mesh)

    def obj(d):
        tb2 = tables.build_tables(d, 0.02, np.array([0.5, 0.5]),
                                  np.array([[0.0, 0.1], [0.1, 0.0]]),
                                  0.05, 0.02, cell_dims=(0.5,))
        return -pmesh.sharded_log_likelihood(sharded, tb2, window=4,
                                             min_len=3, mesh=mesh)

    g = jax.grad(obj)(jnp.array([0.001, 0.08]))
    g_single = jax.grad(lambda d: -pmesh.sharded_log_likelihood(
        batch, tables.build_tables(d, 0.02, np.array([0.5, 0.5]),
                                   np.array([[0.0, 0.1], [0.1, 0.0]]),
                                   0.05, 0.02, cell_dims=(0.5,)),
        window=4, min_len=3))(jnp.array([0.001, 0.08]))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_single),
                               rtol=1e-10)


def test_sharded_pallas_engine_matches_xla():
    """The Pallas custom-VJP kernel inside shard_map (per-chip hot loop of
    a multi-chip fit): value and gradient match the sharded XLA engine."""
    from extrack_tpu.ops import pallas_grad
    batch, tb = _setup()
    mesh = pmesh.make_mesh()
    sharded = pmesh.shard_batch(batch, mesh)
    pallas_grad.INTERPRET = True
    try:
        def obj(d, eng):
            tb2 = tables.build_tables(d, 0.02, np.array([0.5, 0.5]),
                                      np.array([[0.0, 0.1], [0.1, 0.0]]),
                                      0.05, 0.02, cell_dims=(0.5,))
            return -pmesh.sharded_log_likelihood(
                sharded, tb2, window=4, min_len=3, mesh=mesh,
                compute_engine=eng)

        d0 = jnp.array([0.001, 0.08], jnp.float32)
        vx, gx = jax.value_and_grad(lambda d: obj(d, "xla"))(d0)
        vp, gp = jax.value_and_grad(lambda d: obj(d, "pallas"))(d0)
        np.testing.assert_allclose(float(vp), float(vx), rtol=3e-5)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=3e-3, atol=1e-3)
    finally:
        pallas_grad.INTERPRET = False
