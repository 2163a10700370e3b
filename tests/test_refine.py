"""Position refinement vs exact linear-Gaussian oracle + statistical checks."""
import numpy as np

import jax.numpy as jnp

from extrack_tpu import refine
from extrack_tpu.core import oracle
from tests.test_engine import _sim_tracks


def test_refinement_matches_oracle_full_window():
    rng = np.random.default_rng(30)
    Ds = np.array([0.0, 0.1])
    tr = np.array([[.9, .1], [.15, .85]])
    xs, _ = _sim_tracks(rng, 4, 5, 2, Ds, tr, np.array([.5, .5]), 0.02, 0.02)
    lengths = np.array([5, 5, 4, 5])
    d2 = 2.0 * Ds * 0.02
    mu, sig = refine.refine_positions(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(0.02 ** 2),
        jnp.log(jnp.asarray(tr)), jnp.asarray(d2), window=5)
    for i in range(4):
        L = lengths[i]
        want_mu, want_sig = oracle.refined_positions(xs[i][:L], 0.02, Ds, tr,
                                                     dt=0.02)
        np.testing.assert_allclose(np.asarray(mu[i][:L]), want_mu,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(sig[i][:L]), want_sig,
                                   atol=1e-10)
        assert np.all(np.asarray(mu[i][L:]) == 0.0)


def test_refinement_reduces_error():
    # simulate with known true positions; refined estimates must beat raw
    rng = np.random.default_rng(31)
    n, T, D = 200, 12, 2
    loc_err, dt = 0.04, 0.02
    Ds = np.array([0.0, 0.05])
    tr = np.array([[.95, .05], [.05, .95]])
    true = np.zeros((n, T, D))
    states = np.zeros((n, T), dtype=int)
    s = rng.choice(2, n)
    r = np.zeros((n, D))
    for t in range(T):
        states[:, t] = s
        true[:, t] = r
        s_next = np.array([rng.choice(2, p=tr[si]) for si in s])
        step_sig = np.sqrt((2 * Ds[s] * dt + 2 * Ds[s_next] * dt) / 2)
        r = r + rng.normal(size=(n, D)) * step_sig[:, None]
        s = s_next
    obs = true + rng.normal(0, loc_err, true.shape)

    mu, sig = refine.refine_positions(
        jnp.asarray(obs), jnp.full(n, T, dtype=jnp.int32),
        jnp.asarray(loc_err ** 2), jnp.log(jnp.asarray(tr)),
        jnp.asarray(2 * Ds * dt), window=5)
    raw_mse = np.mean((obs - true) ** 2)
    ref_mse = np.mean((np.asarray(mu) - true) ** 2)
    assert ref_mse < 0.8 * raw_mse
    # reported uncertainties should be calibrated within a factor ~1.5
    z = (np.asarray(mu) - true) / np.asarray(sig)
    assert 0.6 < np.std(z) < 1.5


def test_position_refinement_dict_api():
    rng = np.random.default_rng(32)
    Ds = np.array([0.0, 0.1])
    tr = np.array([[.9, .1], [.15, .85]])
    xs, _ = _sim_tracks(rng, 3, 6, 2, Ds, tr, np.array([.5, .5]), 0.02, 0.02)
    tracks = {'6': xs}
    mus, sigmas = refine.position_refinement(
        tracks, 0.02, np.sqrt(2 * Ds * 0.02), np.array([.5, .5]), tr,
        frame_len=4)
    assert mus['6'].shape == (3, 6, 2)
    assert sigmas['6'].shape == (3, 6)
    assert np.all(sigmas['6'] > 0)
    assert np.all(sigmas['6'] < 0.02 + 1e-9)  # refined std <= loc err
