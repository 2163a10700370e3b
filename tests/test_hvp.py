"""Exact Hessian-vector products through the dual-number Pallas kernel
(interpret mode) vs jax.hessian of the XLA engine."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from extrack_tpu.core import engine, tables
from extrack_tpu.ops import pallas_grad, pallas_hvp
from tests.test_engine import _sim_tracks


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_grad.INTERPRET = True
    yield
    pallas_grad.INTERPRET = False


def _fixture(seed=80, B=8, T=7):
    rng = np.random.default_rng(seed)
    Ds = np.array([0.0, 0.1])
    tr = np.array([[.9, .1], [.15, .85]])
    xs, _ = _sim_tracks(rng, B, T, 2, Ds, tr, np.array([.4, .6]),
                        0.02, 0.02)
    lengths = rng.integers(3, T + 1, B)
    lengths[0] = T
    isbl = (lengths < T).astype(float)
    return (jnp.asarray(xs, jnp.float32), jnp.asarray(lengths),
            jnp.asarray(isbl, jnp.float32))


def _tables_fn(n=1, dt=None):
    Fs = jnp.asarray([0.4, 0.6], jnp.float32)
    if dt is None:
        dt = jnp.asarray(0.02, jnp.float32)

    def tables_fn(theta):
        Ds = jnp.stack([theta[0], theta[1]])
        rates = jnp.stack([jnp.stack([0.0 * theta[2], theta[2]]),
                           jnp.stack([theta[3], 0.0 * theta[3]])])
        return tables.build_tables(Ds, theta[4], Fs, rates, theta[5], dt,
                                   cell_dims=(0.8,), nb_substeps=n)

    return tables_fn


THETA = jnp.asarray([0.001, 0.1, 0.1, 0.15, 0.02, 0.1], jnp.float32)


@pytest.mark.parametrize("n,W", [(1, 4), (2, 4)])
def test_hvp_matches_xla_hessian(n, W):
    xs, lengths, isbl = _fixture(80 + n)
    tables_fn = _tables_fn(n=n)

    def xla_obj(theta):
        return -jnp.sum(engine.forward(xs, lengths, isbl,
                                       tables_fn(theta), window=W,
                                       nb_substeps=n, min_len=3))

    H_ref = np.asarray(jax.hessian(xla_obj)(THETA.astype(jnp.float64)))
    g_ref = np.asarray(jax.grad(xla_obj)(THETA))

    grad_z = pallas_hvp.make_grad_z(xs, lengths, isbl, tables_fn,
                                    window=W, nb_substeps=n, min_len=3)
    p = THETA.shape[0]
    cols, g_primal = [], None
    for j in range(p):
        e = jnp.zeros((p,), jnp.float32).at[j].set(1.0)
        g_primal, col = jax.jvp(grad_z, (THETA,), (e,))
        cols.append(np.asarray(col))
    H = np.stack(cols, axis=1)

    np.testing.assert_allclose(np.asarray(g_primal), g_ref, rtol=2e-3,
                               atol=2e-3)
    scale = np.abs(H_ref).max()
    np.testing.assert_allclose(H, H_ref, rtol=5e-3, atol=1e-3 * scale)
    # symmetry within f32 noise
    np.testing.assert_allclose(H, H.T, atol=2e-3 * scale)


@pytest.mark.parametrize("S,W", [(3, 5), (4, 4)])
def test_hvp_default_windows_multistate(S, W):
    """Exact HVP at the DEFAULT fit windows for 3 and 4 states (K=243 /
    256) — the configs where fit(compute_errors=True) used to silently
    fall back to finite differences (VERDICT r4 #3).  supports() must say
    yes and the dual kernel must match jax.hessian of the XLA engine."""
    assert pallas_hvp.supports(7, 2, S, W)
    rng = np.random.default_rng(60 + S)
    Ds = np.linspace(0.0, 0.3, S)
    tr = np.full((S, S), 0.1 / (S - 1)) + np.diag(np.full(S, 0.9 - 0.1
                                                          / (S - 1)))
    Fs = np.full(S, 1.0 / S)
    xs, _ = _sim_tracks(rng, 4, 5, 2, Ds, tr, Fs, 0.02, 0.02)
    lengths = np.array([5, 4, 5, 3])
    isbl = (lengths < 5).astype(float)
    xs = jnp.asarray(xs, jnp.float32)
    lengths = jnp.asarray(lengths)
    isbl = jnp.asarray(isbl, jnp.float32)
    rates0 = jnp.asarray(np.full((S, S), 0.08)
                         - np.diag(np.full(S, 0.08)), jnp.float32)
    Fsj = jnp.asarray(Fs, jnp.float32)

    def tables_fn(theta):
        # theta = (rate scale, LocErr, pBL, D_1..D_{S-1})
        Ds_ = jnp.concatenate([jnp.zeros(1, jnp.float32), theta[3:]])
        return tables.build_tables(Ds_, theta[1], Fsj, rates0 * theta[0],
                                   theta[2], jnp.asarray(0.02, jnp.float32),
                                   cell_dims=(0.8,))

    theta = jnp.asarray([1.0, 0.02, 0.06] + list(Ds[1:]), jnp.float32)

    def xla_obj(th):
        return -jnp.sum(engine.forward(xs, lengths, isbl, tables_fn(th),
                                       window=W, min_len=3))

    H_ref = np.asarray(jax.hessian(xla_obj)(theta.astype(jnp.float64)))
    grad_z = pallas_hvp.make_grad_z(xs, lengths, isbl, tables_fn,
                                    window=W, min_len=3)
    p = theta.shape[0]
    cols = []
    for j in range(p):
        e = jnp.zeros((p,), jnp.float32).at[j].set(1.0)
        cols.append(np.asarray(jax.jvp(grad_z, (theta,), (e,))[1]))
    H = np.stack(cols, axis=1)
    scale = np.abs(H_ref).max()
    np.testing.assert_allclose(H, H_ref, rtol=5e-3, atol=1e-3 * scale)


def test_fit_hessian_hvp_exact_matches_xla():
    """fit's exact-HVP Fisher path == jax.hessian of the XLA objective
    at a common point (the round-3 FD path was only ~1e-4 relative)."""
    import jax as _jax
    from extrack_tpu import data as tdata, fit as tfit
    from extrack_tpu import params as tparams, simulate

    tracks, _, _ = simulate.sim_fov(
        nb_tracks=96, max_track_len=8, min_track_len=4,
        Ds=np.array([0.001, 0.1]), initial_fractions=np.array([0.5, 0.5]),
        TrMat=np.array([[0.9, 0.1], [0.2, 0.8]]), LocErr=0.02,
        cell_dims=[0.5, None, None], dt=0.02, pBL=0.05, seed=21)
    batch = tdata.from_dict(tracks)
    spec = tparams.generate_params(nb_states=2, D_max=1.0,
                                   estimated_Ds=[0.004, 0.08])
    z = jnp.asarray(spec.to_unconstrained())
    obj_x = tfit.make_objective(batch, spec, 0.02, 2, cell_dims=(0.5,),
                                window=4, compute_engine="xla")
    data_x = _jax.device_put(obj_x.batches)
    H_ref = np.asarray(_jax.hessian(lambda zz: obj_x(zz, data_x))(z),
                       dtype=np.float64)
    H = tfit.hessian_hvp_exact(
        obj_x.batches, spec, z, 0.02, 2, cell_dims=(0.5,), nb_substeps=1,
        window=4, min_len=obj_x.resolved_min_len,
        pallas_flags=[True] * len(obj_x.batches),
        has_len2s=obj_x.has_len2s)
    scale = np.abs(H_ref).max()
    np.testing.assert_allclose(H, H_ref, rtol=5e-3, atol=1e-3 * scale)
    e_ref = tfit.fisher_errors_from_hessian(H_ref, spec, np.asarray(z))
    e_hvp = tfit.fisher_errors_from_hessian(H, spec, np.asarray(z))
    for k, v in e_ref.items():
        if v > 1e-8:
            assert abs(e_hvp[k] - v) / v < 1e-3, (k, v, e_hvp[k])


def test_hvp_variable_dt():
    """Per-track dt: tangents flow through the streamed sig2 table."""
    xs, lengths, isbl = _fixture(91)
    rng = np.random.default_rng(7)
    dt = jnp.asarray(rng.uniform(0.01, 0.05, (xs.shape[0], xs.shape[1] - 1)),
                     jnp.float32)
    tables_fn = _tables_fn(dt=dt)

    def xla_obj(theta):
        return -jnp.sum(engine.forward(xs, lengths, isbl,
                                       tables_fn(theta), window=4,
                                       min_len=3))

    H_ref = np.asarray(jax.hessian(xla_obj)(THETA.astype(jnp.float64)))
    grad_z = pallas_hvp.make_grad_z(xs, lengths, isbl, tables_fn,
                                    window=4, min_len=3)
    p = THETA.shape[0]
    cols = []
    for j in range(p):
        e = jnp.zeros((p,), jnp.float32).at[j].set(1.0)
        cols.append(np.asarray(jax.jvp(grad_z, (THETA,), (e,))[1]))
    H = np.stack(cols, axis=1)
    scale = np.abs(H_ref).max()
    np.testing.assert_allclose(H, H_ref, rtol=5e-3, atol=1e-3 * scale)
