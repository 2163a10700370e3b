"""Fixed-state refinement and GIF rendering."""
import os

import numpy as np

import jax.numpy as jnp

from extrack_tpu import refine
from tests.test_engine import _sim_tracks


def test_fixed_states_refinement_exact_kalman():
    """With a single state (no mixture), fixed-state refinement must agree
    with the mixture engine exactly."""
    rng = np.random.default_rng(60)
    Ds = np.array([0.05])
    tr = np.array([[1.0]])
    xs, _ = _sim_tracks(rng, 3, 7, 2, Ds, tr, np.array([1.0]), 0.02, 0.02)
    lengths = np.array([7, 5, 7])
    states = np.zeros((3, 7), dtype=int)
    d2 = jnp.asarray(2 * Ds * 0.02)
    mu1, s1 = refine.refine_positions_fixed_states(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(0.02 ** 2),
        d2, jnp.asarray(states))
    mu2, s2 = refine.refine_positions(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(0.02 ** 2),
        jnp.log(jnp.asarray(tr)), d2, window=2)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-10)


def test_fixed_states_two_state_reduces_error():
    rng = np.random.default_rng(61)
    Ds = np.array([0.0, 0.08])
    tr = np.array([[.9, .1], [.1, .9]])
    xs, states = _sim_tracks(rng, 50, 10, 2, Ds, tr, np.array([.5, .5]),
                             0.03, 0.02)
    lengths = np.full(50, 10)
    mu, sig = refine.refine_positions_fixed_states(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(0.03 ** 2),
        jnp.asarray(2 * Ds * 0.02), jnp.asarray(states))
    assert np.all(np.asarray(sig)[:, :, 0] <= 0.03 + 1e-9)
    assert np.all(np.asarray(sig)[:, :10, 0] > 0)


def test_fixed_states_heterogeneous_exact_posterior():
    """State-CHANGING tracks against the exact tridiagonal Gaussian
    posterior (regression: the backward pass reversed the per-edge step
    variances with node lengths, shifting every step variance by one edge —
    homogeneous-variance tracks can't see it)."""
    rng = np.random.default_rng(63)
    T, L = 6, 4
    pos = rng.normal(0, 0.3, (1, T, 2))
    pos[0, L:] = 9.9                       # garbage in the pad region
    states = np.array([[1, 0, 1, 0, 1, 0]])
    sig2_states = np.array([0.03, 0.9])
    le2 = 0.004
    d2 = sig2_states[states[0, :L]]
    s2step = 0.5 * (d2[:-1] + d2[1:])
    prec = np.zeros((L, L))
    for t in range(L):
        prec[t, t] += 1.0 / le2
    for t in range(L - 1):
        prec[t, t] += 1.0 / s2step[t]
        prec[t + 1, t + 1] += 1.0 / s2step[t]
        prec[t, t + 1] -= 1.0 / s2step[t]
        prec[t + 1, t] -= 1.0 / s2step[t]
    cov = np.linalg.inv(prec)
    mu, sd = refine.refine_positions_fixed_states(
        jnp.asarray(pos), jnp.array([L]), jnp.asarray(le2),
        jnp.asarray(sig2_states), jnp.asarray(states))
    for dim in range(2):
        mu_exact = cov @ (pos[0, :L, dim] / le2)
        np.testing.assert_allclose(np.asarray(mu)[0, :L, dim], mu_exact,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(sd)[0, :L, dim],
                                   np.sqrt(np.diag(cov)), atol=1e-9)


def test_save_gifs(tmp_path):
    rng = np.random.default_rng(62)
    tracks = {"6": rng.normal(0, 0.05, (2, 6, 2)).cumsum(1)}
    mus = {"6": tracks["6"] * 0.9}
    sigmas = {"6": np.full((2, 6), 0.01)}
    refine.save_gifs(tracks, mus, sigmas,
                     gif_pathnames=str(tmp_path / "trk"), max_tracks=1)
    assert os.path.exists(tmp_path / "trk6_0.gif")
