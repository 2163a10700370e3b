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


def test_save_gifs(tmp_path):
    rng = np.random.default_rng(62)
    tracks = {"6": rng.normal(0, 0.05, (2, 6, 2)).cumsum(1)}
    mus = {"6": tracks["6"] * 0.9}
    sigmas = {"6": np.full((2, 6), 0.01)}
    refine.save_gifs(tracks, mus, sigmas,
                     gif_pathnames=str(tmp_path / "trk"), max_tracks=1)
    assert os.path.exists(tmp_path / "trk6_0.gif")
