"""Chunk-accumulated observed information == direct Hessian."""
import numpy as np

import jax.numpy as jnp

from extrack_tpu import data as tdata, fit, params as xp, simulate


def _setup():
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=400, max_track_len=9, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=13)
    batch = tdata.from_dict(tracks)
    spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.004, 0.06])
    return batch, spec


def test_chunked_hessian_matches_direct():
    batch, spec = _setup()
    z = jnp.asarray(spec.to_unconstrained())
    neg = fit.make_objective(batch, spec, 0.02, 2, cell_dims=(0.5,),
                             window=4, compute_engine="xla")
    import jax
    H_direct = np.asarray(jax.hessian(neg)(z), dtype=np.float64)
    H_one = fit.hessian_chunked([batch], spec, z, 0.02, 2,
                                cell_dims=(0.5,), window=4,
                                min_len=3, chunk=10 ** 6)
    H_many = fit.hessian_chunked([batch], spec, z, 0.02, 2,
                                 cell_dims=(0.5,), window=4,
                                 min_len=3, chunk=128)
    np.testing.assert_allclose(H_one, H_direct, rtol=1e-8)
    np.testing.assert_allclose(H_many, H_direct, rtol=1e-8)


def test_fit_compute_errors_chunked():
    batch, spec = _setup()
    res = fit.fit(batch, spec, 0.02, 2, cell_dims=(0.5,), window=4,
                  compute_errors=True, max_iter=60)
    assert res.std_errors is not None and len(res.std_errors) > 0
    assert all(v > 0 for v in res.std_errors.values()), res.std_errors
    assert "LocErr" in res.std_errors
    assert abs(res.params["D1"].value - 0.08) < 0.02
