"""Pallas gradient kernel vs XLA autodiff (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from extrack_tpu.core import engine, tables
from extrack_tpu.ops import pallas_grad
from tests.test_engine import _sim_tracks


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_grad.INTERPRET = True
    yield
    pallas_grad.INTERPRET = False


def _theta_objective(xs, lengths, isbl, use_pallas, W=4, n=1, dt=None):
    Fs = jnp.asarray([0.4, 0.6], jnp.float32)
    if dt is None:
        dt = jnp.asarray(0.02, jnp.float32)

    def obj(theta):
        Ds = jnp.stack([theta[0], theta[1]])
        rates = jnp.stack([jnp.stack([0.0 * theta[2], theta[2]]),
                           jnp.stack([theta[3], 0.0 * theta[3]])])
        tb = tables.build_tables(Ds, theta[4], Fs, rates, theta[5], dt,
                                 cell_dims=(0.8,), nb_substeps=n)
        if use_pallas:
            return pallas_grad.neg_log_likelihood(
                xs, lengths, isbl, tb, window=W, nb_substeps=n, min_len=3)
        return -jnp.sum(engine.forward(xs, lengths, isbl, tb, window=W,
                                       nb_substeps=n, min_len=3))

    return obj


@pytest.mark.parametrize("n,W", [(1, 4), (2, 4)])
def test_grad_kernel_matches_xla(n, W):
    rng = np.random.default_rng(80 + n)
    Ds = np.array([0.0, 0.1])
    tr = np.array([[.9, .1], [.15, .85]])
    xs, _ = _sim_tracks(rng, 6, 7, 2, Ds, tr, np.array([.4, .6]), 0.02, 0.02)
    lengths = np.array([7, 5, 7, 3, 6, 7])
    isbl = (lengths < 7).astype(float)
    xs = jnp.asarray(xs, jnp.float32)
    lengths = jnp.asarray(lengths)
    isbl = jnp.asarray(isbl, jnp.float32)
    theta = jnp.asarray([0.001, 0.1, 0.1, 0.15, 0.02, 0.1], jnp.float32)

    v_ref, g_ref = jax.value_and_grad(
        _theta_objective(xs, lengths, isbl, False, W, n))(theta)
    v_pl, g_pl = jax.value_and_grad(
        _theta_objective(xs, lengths, isbl, True, W, n))(theta)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("n,W,per_track", [(1, 4, True), (1, 4, False),
                                           (2, 4, True)])
def test_grad_kernel_variable_dt(n, W, per_track):
    """Value and gradient (incl. through the streamed sig2 table back to
    Ds and dt) match XLA autodiff with per-step / per-track dt."""
    rng = np.random.default_rng(90 + n)
    Ds = np.array([0.0, 0.1])
    tr = np.array([[.9, .1], [.15, .85]])
    xs, _ = _sim_tracks(rng, 6, 7, 2, Ds, tr, np.array([.4, .6]), 0.02, 0.02)
    lengths = np.array([7, 5, 7, 3, 6, 7])
    isbl = (lengths < 7).astype(float)
    xs = jnp.asarray(xs, jnp.float32)
    lengths = jnp.asarray(lengths)
    isbl = jnp.asarray(isbl, jnp.float32)
    shape = (6, 6) if per_track else (6,)
    dt = jnp.asarray(rng.uniform(0.01, 0.05, shape), jnp.float32)
    theta = jnp.asarray([0.001, 0.1, 0.1, 0.15, 0.02, 0.1], jnp.float32)

    v_ref, g_ref = jax.value_and_grad(
        _theta_objective(xs, lengths, isbl, False, W, n, dt=dt))(theta)
    v_pl, g_pl = jax.value_and_grad(
        _theta_objective(xs, lengths, isbl, True, W, n, dt=dt))(theta)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)

    # gradient w.r.t. the dt array itself flows through the stream
    def obj_dt(dt_):
        return _theta_objective(xs, lengths, isbl, True, W, n,
                                dt=dt_)(theta)

    def obj_dt_ref(dt_):
        return _theta_objective(xs, lengths, isbl, False, W, n,
                                dt=dt_)(theta)

    g_dt = jax.grad(obj_dt)(dt)
    g_dt_ref = jax.grad(obj_dt_ref)(dt)
    np.testing.assert_allclose(np.asarray(g_dt), np.asarray(g_dt_ref),
                               rtol=2e-3, atol=2e-3)


def test_fit_objective_pallas_per_track_dt():
    """make_objective(compute_engine='pallas') == 'xla' for a dt-dict
    dataset (per-track dt rides the Pallas kernels end-to-end)."""
    from extrack_tpu import data as tdata, fit, params as xp, simulate
    rng = np.random.default_rng(3)
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=150, max_track_len=8, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, .1], [.1, .9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=21)
    dt_dict = {k: rng.uniform(0.015, 0.03,
                              (v.shape[0], v.shape[1] - 1)).astype(
                                  np.float32)
               for k, v in tracks.items()}
    batch = tdata.from_dict_bucketed(tracks, max_buckets=2, dt=dt_dict)
    assert any(b.dt is not None for b in batch)
    spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.001, 0.05])
    z = jnp.asarray(spec.to_unconstrained(), jnp.float32)
    obj_x = fit.make_objective(batch, spec, 0.02, 2, cell_dims=(0.5,),
                               window=4, compute_engine="xla")
    obj_p = fit.make_objective(batch, spec, 0.02, 2, cell_dims=(0.5,),
                               window=4, compute_engine="pallas")
    vx, gx = jax.value_and_grad(obj_x)(z)
    vp, gp = jax.value_and_grad(obj_p)(z)
    np.testing.assert_allclose(float(vp), float(vx), rtol=3e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=5e-3, atol=5e-3)


def test_grad_kernel_padded_time_and_batch():
    """Canonical program shapes pad T past every track's length and add
    zero-length tracks; the dynamic trip count must stop at the block's
    real max length and leave padded rows/lanes exactly zero."""
    rng = np.random.default_rng(91)
    Ds = np.array([0.0, 0.1])
    tr = np.array([[.9, .1], [.15, .85]])
    xs, _ = _sim_tracks(rng, 6, 7, 2, Ds, tr, np.array([.4, .6]), 0.02,
                        0.02)
    lengths = np.array([7, 5, 7, 3, 6, 7])
    isbl = (lengths < 7).astype(float)
    # pad T 7 -> 12 (ladder shape) and the batch with two empty tracks
    xs_p = np.zeros((8, 12, 2), np.float32)
    xs_p[:6, :7] = xs
    len_p = np.concatenate([lengths, [0, 0]]).astype(np.int32)
    isbl_p = np.concatenate([isbl, [0.0, 0.0]]).astype(np.float32)
    theta = jnp.asarray([0.001, 0.1, 0.1, 0.15, 0.02, 0.1], jnp.float32)

    v_ref, g_ref = jax.value_and_grad(_theta_objective(
        jnp.asarray(xs, jnp.float32), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), False, 4, 1))(theta)
    v_pl, g_pl = jax.value_and_grad(_theta_objective(
        jnp.asarray(xs_p), jnp.asarray(len_p), jnp.asarray(isbl_p),
        True, 4, 1))(theta)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


def test_fuzz_grad_random_configs_len2_and_multiblock():
    """Random configs through value AND gradient: length-2 lanes (the
    close_l2 pullback), B > block (grid > 1 cross-program cotangent
    accumulation), and per-track dt — corners the fixed-case tests skip."""
    rng = np.random.default_rng(99)
    for trial in range(3):
        T = int(rng.integers(5, 8))
        W = int(rng.integers(3, 5))
        B = 160                       # > block=128 -> two grid programs
        dt_mode = ["const", "per_track"][trial % 2]
        dt = (jnp.asarray(0.02, jnp.float32) if dt_mode == "const"
              else jnp.asarray(0.02 * rng.uniform(0.5, 1.5, (B, T - 1)),
                               jnp.float32))
        xs = jnp.asarray(rng.normal(0, 0.2, (B, T, 2)).cumsum(1),
                         jnp.float32)
        lengths = rng.integers(2, T + 1, B)     # includes 2-frame tracks
        lengths[0] = T
        lengths[1] = 2
        lengths = jnp.asarray(lengths, jnp.int32)
        isbl = jnp.asarray(rng.integers(0, 2, B), jnp.float32)
        theta = jnp.asarray([1e-4, 0.08, 0.09, 0.06, 0.02, 0.05],
                            jnp.float32)

        def obj(use_pallas):
            def f(th):
                Ds = jnp.stack([th[0], th[1]])
                rates = jnp.stack([jnp.stack([0.0 * th[2], th[2]]),
                                   jnp.stack([th[3], 0.0 * th[3]])])
                tb = tables.build_tables(Ds, th[4],
                                         jnp.asarray([0.4, 0.6],
                                                     jnp.float32),
                                         rates, th[5], dt, cell_dims=(0.8,))
                if use_pallas:
                    return pallas_grad.neg_log_likelihood(
                        xs, lengths, isbl, tb, window=W, min_len=2,
                        block=128, has_len2=True)
                return -jnp.sum(engine.forward(xs, lengths, isbl, tb,
                                               window=W, min_len=2))
            return f

        msg = f"trial {trial}: T={T} W={W} dt={dt_mode}"
        v1, g1 = jax.value_and_grad(obj(True))(theta)
        v2, g2 = jax.value_and_grad(obj(False))(theta)
        np.testing.assert_allclose(float(v1), float(v2), rtol=2e-4,
                                   err_msg="value " + msg)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg="grad " + msg)
        # value-only path (the forward-kernel primal) agrees too
        v3 = obj(True)(theta)
        np.testing.assert_allclose(float(v3), float(v2), rtol=2e-4,
                                   err_msg="primal " + msg)


def test_grad_kernel_under_vmap():
    """jax.vmap over the custom-VJP kernel's value_and_grad — the batching
    rule the vmapped-chains HMC sampler exercises on TPU (ADVICE r3: the
    CPU-forced suite never batched the Pallas path).  vmap of a
    pallas_call lifts to a leading grid dimension; parity vs per-element
    application checks both the primal and pullback batching rules."""
    rng = np.random.default_rng(42)
    Ds = np.array([0.0, 0.1])
    tr = np.array([[.9, .1], [.15, .85]])
    xs, _ = _sim_tracks(rng, 6, 7, 2, Ds, tr, np.array([.4, .6]), 0.02, 0.02)
    lengths = jnp.asarray(np.array([7, 5, 7, 3, 6, 7]))
    isbl = jnp.asarray((np.array([7, 5, 7, 3, 6, 7]) < 7).astype(np.float32))
    xs = jnp.asarray(xs, jnp.float32)

    obj = _theta_objective(xs, lengths, isbl, True, 4, 1)
    obj_ref = _theta_objective(xs, lengths, isbl, False, 4, 1)
    thetas = jnp.asarray(
        np.array([0.001, 0.1, 0.1, 0.15, 0.02, 0.1], np.float32)
        * rng.uniform(0.8, 1.2, (3, 6)).astype(np.float32))

    vs, gs = jax.vmap(jax.value_and_grad(obj))(thetas)
    for c in range(3):
        v_ref, g_ref = jax.value_and_grad(obj_ref)(thetas[c])
        np.testing.assert_allclose(float(vs[c]), float(v_ref), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(gs[c]), np.asarray(g_ref),
                                   rtol=2e-3, atol=2e-3)


def test_grad_kernel_three_states():
    """3-state parity (A=3, G=27: odd group sizes stress the backward's
    per-slot interleave/untile, which the 2-state cases never do)."""
    rng = np.random.default_rng(7)
    Ds = np.array([0.0, 0.05, 0.2])
    tr = np.array([[.8, .1, .1], [.1, .8, .1], [.05, .15, .8]])
    Fs = np.array([.3, .3, .4])
    xs, _ = _sim_tracks(rng, 8, 6, 2, Ds, tr, Fs, 0.02, 0.02)
    lengths = np.array([6, 5, 6, 3, 4, 6, 2, 5])
    isbl = (lengths < 6).astype(float)
    xs = jnp.asarray(xs, jnp.float32)
    lengths = jnp.asarray(lengths)
    isbl = jnp.asarray(isbl, jnp.float32)

    def obj(use_pallas):
        def f(th):
            Ds_ = jnp.stack([th[0], th[1], th[2]])
            rates = jnp.stack(
                [jnp.stack([0.0 * th[3], th[3], th[4]]),
                 jnp.stack([th[5], 0.0 * th[3], th[6]]),
                 jnp.stack([th[7], th[8], 0.0 * th[3]])])
            tb = tables.build_tables(Ds_, th[9], jnp.asarray(Fs,
                                                            jnp.float32),
                                     rates, th[10],
                                     jnp.asarray(0.02, jnp.float32),
                                     cell_dims=(0.8,))
            if use_pallas:
                return pallas_grad.neg_log_likelihood(
                    xs, lengths, isbl, tb, window=4, min_len=2,
                    has_len2=True)
            return -jnp.sum(engine.forward(xs, lengths, isbl, tb,
                                           window=4, min_len=2))
        return f

    theta = jnp.asarray([1e-4, 0.04, 0.18, 0.1, 0.12, 0.08, 0.14, 0.06,
                         0.16, 0.02, 0.06], jnp.float32)
    v_pl, g_pl = jax.value_and_grad(obj(True))(theta)
    v_x, g_x = jax.value_and_grad(obj(False))(theta)
    np.testing.assert_allclose(float(v_pl), float(v_x), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_x),
                               rtol=3e-3, atol=3e-3)


def test_grad_kernel_five_states():
    """5-state parity at the scheduled window (W=3, K=125, A=5, G=25):
    every register dimension is odd and 8-unaligned, the regime the
    VERDICT r4 5-state demonstration exercises."""
    rng = np.random.default_rng(11)
    Ds = np.array([0.0, 0.02, 0.08, 0.2, 0.5])
    tr = np.full((5, 5), 0.05) + np.diag(np.full(5, 0.75))
    Fs = np.full(5, 0.2)
    xs, _ = _sim_tracks(rng, 6, 5, 2, Ds, tr, Fs, 0.02, 0.02)
    lengths = np.array([5, 4, 5, 3, 5, 2])
    isbl = (lengths < 5).astype(float)
    xs = jnp.asarray(xs, jnp.float32)
    lengths = jnp.asarray(lengths)
    isbl = jnp.asarray(isbl, jnp.float32)
    rates0 = np.full((5, 5), 0.06) - np.diag(np.full(5, 0.06))

    def obj(use_pallas):
        def f(th):
            # th = (scale on rates, LocErr, pBL) + Ds tail: enough moving
            # parts to touch every table cotangent without a 25-param fit
            Ds_ = jnp.concatenate([jnp.zeros(1, jnp.float32), th[3:7]])
            rates = jnp.asarray(rates0, jnp.float32) * th[0]
            tb = tables.build_tables(
                Ds_, th[1], jnp.asarray(Fs, jnp.float32), rates, th[2],
                jnp.asarray(0.02, jnp.float32), cell_dims=(0.8,))
            if use_pallas:
                return pallas_grad.neg_log_likelihood(
                    xs, lengths, isbl, tb, window=3, min_len=2,
                    has_len2=True)
            return -jnp.sum(engine.forward(xs, lengths, isbl, tb,
                                           window=3, min_len=2))
        return f

    theta = jnp.asarray([1.0, 0.02, 0.06, 0.02, 0.08, 0.2, 0.5],
                        jnp.float32)
    v_pl, g_pl = jax.value_and_grad(obj(True))(theta)
    v_x, g_x = jax.value_and_grad(obj(False))(theta)
    np.testing.assert_allclose(float(v_pl), float(v_x), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_x),
                               rtol=3e-3, atol=3e-3)
