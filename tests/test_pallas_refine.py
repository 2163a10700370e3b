"""Refinement kernel parity vs the XLA path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from extrack_tpu import refine
from extrack_tpu.ops import pallas_refine


def _setup(seed, n_tracks=24, T=9, S=2, D=2, uniform=False):
    rng = np.random.default_rng(seed)
    xs = np.cumsum(rng.normal(0, 0.05, (n_tracks, T, D)), axis=1)
    lengths = (np.full(n_tracks, T) if uniform
               else rng.integers(2, T + 1, n_tracks))
    tr = np.full((S, S), 0.1 / (S - 1))
    np.fill_diagonal(tr, 0.9)
    log_trans = np.log(tr)
    sig2_states = (0.08 * (1 + np.arange(S))) ** 2
    return (jnp.asarray(xs), jnp.asarray(lengths, jnp.int32),
            jnp.asarray(log_trans), jnp.asarray(sig2_states))


@pytest.mark.parametrize("W,uniform", [(4, True), (5, False), (7, False)])
def test_refine_kernel_matches_xla(W, uniform):
    xs, lengths, log_trans, sig2 = _setup(3 + W, uniform=uniform)
    loc_err2 = jnp.asarray(0.02 ** 2)[None, None, None]
    mu_ref, sig_ref = refine.refine_positions(
        xs, lengths, loc_err2, log_trans, sig2, window=W)
    mu, sig = pallas_refine.refine_pallas(
        xs, lengths, loc_err2, log_trans, sig2, window=W, interpret=True)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref),
                               rtol=2e-3, atol=2e-5)


def test_refine_kernel_per_peak_locerr():
    xs, lengths, log_trans, sig2 = _setup(11, n_tracks=16, T=8)
    rng = np.random.default_rng(0)
    loc_err2 = jnp.asarray(
        rng.uniform(0.01, 0.04, xs.shape) ** 2)
    mu_ref, sig_ref = refine.refine_positions(
        xs, lengths, loc_err2, log_trans, sig2, window=5)
    mu, sig = pallas_refine.refine_pallas(
        xs, lengths, loc_err2, log_trans, sig2, window=5, interpret=True)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref),
                               rtol=2e-3, atol=2e-5)


def test_refine_kernel_blocks_and_padding():
    xs, lengths, log_trans, sig2 = _setup(7, n_tracks=150, T=6)
    loc_err2 = jnp.asarray(0.03 ** 2)[None, None, None]
    mu_ref, sig_ref = refine.refine_positions(
        xs, lengths, loc_err2, log_trans, sig2, window=4)
    mu, sig = pallas_refine.refine_pallas(
        xs, lengths, loc_err2, log_trans, sig2, window=4, block=128,
        interpret=True)
    assert mu.shape == (150, 6, 2)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref),
                               rtol=2e-3, atol=2e-5)
    # padding masked to zero exactly
    valid = np.arange(6)[None, :] < np.asarray(lengths)[:, None]
    assert np.all(np.asarray(mu)[~valid] == 0.0)
    assert np.all(np.asarray(sig)[~valid] == 0.0)


@pytest.mark.parametrize("S,W", [(3, 3), (3, 4), (3, 5), (5, 2)])
def test_refine_kernel_odd_states(S, W):
    """Odd-K models (3-state: K = 3**W) run the VMEM kernel via the
    time-leading stash + static state-block pair loop (verdict r3 #3);
    parity vs the XLA mixture path."""
    xs, lengths, log_trans, sig2 = _setup(5 + S + W, n_tracks=12, T=7, S=S)
    loc_err2 = jnp.asarray(0.02 ** 2)[None, None, None]
    mu_ref, sig_ref = refine.refine_positions(
        xs, lengths, loc_err2, log_trans, sig2, window=W)
    mu, sig = pallas_refine.refine_pallas(
        xs, lengths, loc_err2, log_trans, sig2, window=W, interpret=True)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref),
                               rtol=2e-3, atol=2e-5)


def test_refine_fallback_warns(monkeypatch):
    """When auto mode on TPU would drop to the XLA path, the driver warns
    (predict/hist already did; verdict r3 #3)."""
    import warnings

    import jax as _jax

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(refine, "_pallas_eligible",
                        lambda *a, **k: False)
    rng = np.random.default_rng(1)
    tracks = {"4": np.cumsum(rng.normal(0, 0.05, (3, 4, 2)), axis=1)}
    ds = np.array([0.02, 0.1, 0.2])
    tr = np.full((3, 3), 0.1)
    np.fill_diagonal(tr, 0.8)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        refine.position_refinement(
            tracks, 0.02, ds, np.array([1 / 3] * 3), tr, frame_len=4,
            compute_engine="auto")
    msgs = [str(w.message) for w in rec
            if issubclass(w.category, RuntimeWarning)]
    assert any("VMEM budget" in m for m in msgs), msgs


def test_pallas_window_schedule():
    assert refine.pallas_window(2) == 7
    assert 4 <= refine.pallas_window(3) <= 6
    assert refine.pallas_window(4) >= 3


def test_position_refinement_forced_pallas_matches_xla():
    rng = np.random.default_rng(42)
    tracks = {"5": np.cumsum(rng.normal(0, 0.05, (7, 5, 2)), axis=1),
              "8": np.cumsum(rng.normal(0, 0.05, (5, 8, 2)), axis=1)}
    ds = np.array([0.02, 0.1])
    tr = np.array([[0.9, 0.1], [0.2, 0.8]])
    mus_x, sigs_x = refine.position_refinement(
        tracks, 0.02, ds, np.array([0.5, 0.5]), tr, frame_len=5,
        compute_engine="xla")
    mus_p, sigs_p = refine.position_refinement(
        tracks, 0.02, ds, np.array([0.5, 0.5]), tr, frame_len=5,
        compute_engine="pallas")
    for k in tracks:
        np.testing.assert_allclose(mus_p[k], mus_x[k], rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(sigs_p[k], sigs_x[k], rtol=2e-3,
                                   atol=2e-5)
