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


def test_hessian_fd_matches_ad():
    """Central differences of exact gradients reproduce jax.hessian."""
    import jax
    import jax.numpy as jnp
    from extrack_tpu.fit import hessian_fd_from_gradients

    A = jnp.asarray(np.array([[4.0, 1.0, 0.3], [1.0, 3.0, 0.2],
                              [0.3, 0.2, 2.0]]))

    def f(z):
        return 0.5 * z @ A @ z + jnp.sum(jnp.sin(z))

    z0 = jnp.asarray([0.3, -0.7, 1.1])
    H_ad = np.asarray(jax.hessian(f)(z0))
    H_fd = hessian_fd_from_gradients(jax.grad(f), z0)
    np.testing.assert_allclose(H_fd, H_ad, rtol=1e-4, atol=1e-6)


def test_fit_errors_via_pallas_fd_path():
    """compute_errors with the Pallas objective uses FD-of-gradients and
    agrees with the XLA second-order path AT A COMMON OPTIMUM.

    Two independent fits land at minutely different optima (f32 kernel
    rounding perturbs the optimizer path), and near-boundary parameters
    (true D0 = 0 here) have curvature sensitive enough that comparing the
    errors of two separate fits conflates optimizer drift with FD error —
    so the tight comparison pins both error paths to the XLA fit's z*."""
    import jax
    from extrack_tpu import fit as tfit, params as tparams, simulate
    from extrack_tpu.ops import pallas_grad

    tracks, _, _ = simulate.sim_fov(
        nb_tracks=160, max_track_len=8, min_track_len=5,
        Ds=np.array([0.0, 0.1]), initial_fractions=np.array([0.5, 0.5]),
        TrMat=np.array([[0.9, 0.1], [0.2, 0.8]]), LocErr=0.02,
        cell_dims=[0.5, None, None], dt=0.02, pBL=0.05, seed=3)
    from extrack_tpu import data as tdata
    batch = tdata.from_dict(tracks)
    spec = tparams.generate_params(nb_states=2, D_max=1.0,
                                   estimated_Ds=[0.001, 0.08])
    # end-to-end: the Pallas FD path produces finite positive errors
    old = pallas_grad.INTERPRET
    pallas_grad.INTERPRET = True
    try:
        r_pl = tfit.fit(batch, spec, 0.02, 2, cell_dims=(0.5,), window=5,
                        compute_errors=True, compute_engine="pallas",
                        max_iter=40)
        assert r_pl.std_errors
        assert all(np.isfinite(v) and v > 0
                   for v in r_pl.std_errors.values()), r_pl.std_errors

        # common-point comparison: FD of Pallas gradients vs the exact
        # XLA Hessian at the XLA fit's optimum
        r_xla = tfit.fit(batch, spec, 0.02, 2, cell_dims=(0.5,),
                         window=5, compute_errors=True,
                         compute_engine="xla", max_iter=40)
        z = jnp.asarray(r_xla.params.to_unconstrained())
        obj_x = tfit.make_objective(batch, spec, 0.02, 2,
                                    cell_dims=(0.5,), window=5,
                                    compute_engine="xla")
        obj_p = tfit.make_objective(batch, spec, 0.02, 2,
                                    cell_dims=(0.5,), window=5,
                                    compute_engine="pallas")
        data_x = jax.device_put(obj_x.batches)
        data_p = jax.device_put(obj_p.batches)
        H_ad = np.asarray(jax.hessian(lambda zz: obj_x(zz, data_x))(z))
        gp = jax.jit(jax.grad(lambda zz: obj_p(zz, data_p)))
        H_fd = tfit.hessian_fd_from_gradients(gp, z)
    finally:
        pallas_grad.INTERPRET = old
    e_ad = tfit.fisher_errors_from_hessian(H_ad, r_xla.params,
                                           np.asarray(z))
    e_fd = tfit.fisher_errors_from_hessian(H_fd, r_xla.params,
                                           np.asarray(z))
    for k, v in e_ad.items():
        assert np.isfinite(e_fd[k])
        if v > 1e-8:
            assert abs(e_fd[k] - v) / v < 0.02, (k, v, e_fd[k])
