"""Coverage for reference-supported regimes not exercised elsewhere:
3D tracks (reference handles any nb_dims via the trailing axis,
extrack/tracking.py:1318) and >=4 diffusive states (the reference
tutorial's model-selection scan goes to 5 states).

The engine/kernels are dimension- and state-count-generic by design
((D, K, B) layout); these tests pin that down against the
exact-enumeration oracle.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from extrack_tpu.core import engine, tables
from extrack_tpu.ops import pallas_engine
from tests.test_engine import _run_both, _sim_tracks


def test_three_dims_exact_window():
    """D=3 tracks, exact window: engine == oracle at f64 precision."""
    rng = np.random.default_rng(11)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    rates = np.array([[0.0, 0.1], [0.15, 0.0]])
    xs, _ = _sim_tracks(rng, 5, 6, 3, Ds, np.array([[.9, .1], [.15, .85]]),
                        Fs, 0.02, 0.02)
    assert xs.shape[-1] == 3
    lengths = np.array([6, 6, 5, 4, 6])
    isbl = np.array([1, 0, 1, 1, 0])
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, 0.02, 0.02,
                          0.1, (0.8,), n=1, W=6, min_len=3)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_four_state_exact_window():
    """S=4 states, exact window: engine == oracle at f64 precision."""
    rng = np.random.default_rng(12)
    Ds = np.array([0.0, 0.02, 0.1, 0.4])
    Fs = np.array([0.2, 0.3, 0.3, 0.2])
    rates = np.full((4, 4), 0.06)
    tr = np.full((4, 4), 0.1) + np.eye(4) * 0.6
    xs, _ = _sim_tracks(rng, 4, 5, 2, Ds, tr, Fs, 0.02, 0.02)
    lengths = np.full(4, 5)
    isbl = np.array([1.0, 0.0, 1.0, 1.0])
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, 0.02, 0.02,
                          0.1, (1.0,), n=1, W=5, min_len=3)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_four_state_window_approximation():
    """S=4 with a short window stays close to exact enumeration."""
    rng = np.random.default_rng(13)
    Ds = np.array([0.0, 0.02, 0.1, 0.4])
    Fs = np.array([0.2, 0.3, 0.3, 0.2])
    rates = np.full((4, 4), 0.06)
    tr = np.full((4, 4), 0.1) + np.eye(4) * 0.6
    xs, _ = _sim_tracks(rng, 6, 7, 2, Ds, tr, Fs, 0.02, 0.02)
    lengths = np.full(6, 7)
    isbl = np.ones(6)
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, 0.02, 0.02,
                          0.1, (1.0,), n=1, W=3, min_len=3)
    np.testing.assert_allclose(got, want, rtol=0, atol=0.05)


@pytest.mark.parametrize("D,S,W", [(3, 2, 5), (2, 4, 3)])
def test_pallas_generic_dims_states(D, S, W):
    """Pallas forward kernel parity at D=3 and S=4 (interpret mode)."""
    rng = np.random.default_rng(20 + D + S)
    if S == 2:
        Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
        rates = np.array([[0.0, 0.1], [0.15, 0.0]])
        tr = np.array([[.9, .1], [.15, .85]])
    else:
        Ds = np.array([0.0, 0.02, 0.1, 0.4])
        Fs = np.array([0.2, 0.3, 0.3, 0.2])
        rates = np.full((S, S), 0.06)
        tr = np.full((S, S), 0.1) + np.eye(S) * 0.6
    xs, _ = _sim_tracks(rng, 10, 8, D, Ds, tr, Fs, 0.02, 0.02)
    lengths = rng.integers(3, 9, 10)
    lengths[0] = 8
    isbl = (lengths < 8).astype(float)
    tb = tables.build_tables(
        jnp.asarray(Ds, jnp.float32), jnp.asarray(0.02, jnp.float32),
        jnp.asarray(Fs, jnp.float32), jnp.asarray(rates, jnp.float32),
        jnp.asarray(0.1, jnp.float32), jnp.asarray(0.02, jnp.float32),
        cell_dims=(0.8,), nb_substeps=1)
    ref = engine.forward(jnp.asarray(xs, jnp.float32),
                         jnp.asarray(lengths),
                         jnp.asarray(isbl, jnp.float32), tb,
                         window=W, nb_substeps=1, min_len=3)
    got = pallas_engine.forward_pallas(
        jnp.asarray(xs, jnp.float32), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=W, nb_substeps=1,
        min_len=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_three_dims_fit_drivers_smoke():
    """3D length-dict flows through the public fit/predict/hist drivers."""
    from extrack_tpu import fit, histograms, predict, simulate
    from extrack_tpu import params as xp

    tracks, _, _ = simulate.sim_fov(
        nb_tracks=60, max_track_len=9, min_track_len=4, LocErr=0.02,
        Ds=[0.0, 0.1], dt=0.02, nb_dims=3, seed=21)
    assert all(v.shape[-1] == 3 for v in tracks.values())
    p = xp.generate_params(nb_states=2, estimated_LocErr=0.02,
                           D_max=1.0).resolve()
    preds = predict.predict_Bs(tracks, 0.02, p, nb_states=2, frame_len=4)
    for key, v in tracks.items():
        pb = preds[key]
        assert pb.shape == v.shape[:2] + (2,)
        np.testing.assert_allclose(pb.sum(-1), 1.0, atol=1e-5)
    hist = histograms.len_hist(tracks, p, 0.02, nb_states=2, window=4)
    assert np.isfinite(hist).all() and hist.sum() > 0
    res = fit.param_fitting(tracks, 0.02, nb_states=2, frame_len=3,
                            verbose=0, max_iter=4)
    assert np.isfinite(res.logl)
