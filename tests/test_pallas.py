"""Pallas kernel parity vs the XLA engine (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from extrack_tpu.core import engine, tables
from extrack_tpu.ops import pallas_engine
from tests.test_engine import _sim_tracks


def _setup(seed, n_tracks=12, T=9, S=2, n=1):
    rng = np.random.default_rng(seed)
    if S == 2:
        Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
        rates = np.array([[0.0, 0.1], [0.15, 0.0]])
        tr = np.array([[.9, .1], [.15, .85]])
    else:
        Ds = np.array([0.001, 0.05, 0.3])
        Fs = np.array([0.3, 0.4, 0.3])
        rates = np.full((3, 3), 0.08)
        tr = np.array([[.8, .1, .1], [.1, .8, .1], [.1, .1, .8]])
    xs, _ = _sim_tracks(rng, n_tracks, T, 2, Ds, tr, Fs, 0.02, 0.02)
    lengths = rng.integers(2, T + 1, n_tracks)
    lengths[0] = T
    isbl = (lengths < T).astype(float)
    tb = tables.build_tables(
        jnp.asarray(Ds, jnp.float32), jnp.asarray(0.02, jnp.float32),
        jnp.asarray(Fs, jnp.float32), jnp.asarray(rates, jnp.float32),
        jnp.asarray(0.1, jnp.float32), jnp.asarray(0.02, jnp.float32),
        cell_dims=(0.8,), nb_substeps=n)
    return xs.astype(np.float32), lengths, isbl, tb


@pytest.mark.parametrize("S,n,W", [(2, 1, 6), (3, 1, 4), (2, 2, 5)])
def test_pallas_matches_engine(S, n, W):
    xs, lengths, isbl, tb = _setup(40 + S + n, S=S, n=n)
    ref = engine.forward(jnp.asarray(xs), jnp.asarray(lengths),
                         jnp.asarray(isbl, jnp.float32), tb,
                         window=W, nb_substeps=n, min_len=3)
    got = pallas_engine.forward_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=W, nb_substeps=n,
        min_len=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("S,n,W,per_track", [
    (2, 1, 6, False), (2, 1, 5, True), (3, 1, 4, True), (2, 2, 5, False)])
def test_pallas_variable_dt(S, n, W, per_track):
    """Streamed per-step / per-track displacement-variance tables match the
    XLA engine (sig2_ag_at, core/engine.py:160-166)."""
    xs, lengths, isbl, tb = _setup(60 + S + n, S=S, n=n)
    rng = np.random.default_rng(7)
    B, T = xs.shape[0], xs.shape[1]
    Ds = np.linspace(0.0, 0.2, S)
    if per_track:
        dt = rng.uniform(0.01, 0.05, (B, T - 1)).astype(np.float32)
    else:
        dt = rng.uniform(0.01, 0.05, (T - 1,)).astype(np.float32)
    tb = tables.build_tables(
        jnp.asarray(Ds, jnp.float32), jnp.asarray(0.02, jnp.float32),
        jnp.asarray(np.full(S, 1.0 / S), jnp.float32),
        jnp.asarray(np.full((S, S), 0.08), jnp.float32),
        jnp.asarray(0.1, jnp.float32), jnp.asarray(dt),
        cell_dims=(0.8,), nb_substeps=n)
    ref = engine.forward(jnp.asarray(xs), jnp.asarray(lengths),
                         jnp.asarray(isbl, jnp.float32), tb,
                         window=W, nb_substeps=n, min_len=3)
    got = pallas_engine.forward_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=W, nb_substeps=n,
        min_len=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_padding_and_blocks():
    xs, lengths, isbl, tb = _setup(50, n_tracks=200, T=7)
    got = pallas_engine.forward_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=4, min_len=3,
        block=128, interpret=True)
    ref = engine.forward(jnp.asarray(xs), jnp.asarray(lengths),
                         jnp.asarray(isbl, jnp.float32), tb,
                         window=4, min_len=3)
    assert got.shape == (200,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_padded_time_and_batch():
    """Canonical shapes pad T past every length and add empty tracks; the
    dynamic trip count must not change any per-track likelihood."""
    xs, lengths, isbl, tb = _setup(77, T=7)
    ref = engine.forward(jnp.asarray(xs), jnp.asarray(lengths),
                         jnp.asarray(isbl, jnp.float32), tb,
                         window=5, min_len=3)
    B, T, D = xs.shape
    xs_p = np.zeros((B + 4, T + 5, D), np.float32)
    xs_p[:B, :T] = xs
    len_p = np.concatenate([lengths, [0, 0, 0, 0]]).astype(np.int32)
    isbl_p = np.concatenate([isbl, np.zeros(4)]).astype(np.float32)
    got = pallas_engine.forward_pallas(
        jnp.asarray(xs_p), jnp.asarray(len_p),
        jnp.asarray(isbl_p, jnp.float32), tb, window=5, min_len=3,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got)[:B], np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got)[B:], 0.0, atol=1e-7)


def test_pallas_per_track_dt_two_frames():
    """T=2 with PER-TRACK dt: the (B, 1, P) sig2 table has one step row per
    track but still differs across lanes (regression: the row-count
    classifier broadcast track 0's dt to the whole batch).  Covers all four
    kernels through their public wrappers."""
    import jax
    from extrack_tpu import data as tdata, params as xp
    from extrack_tpu.ops import pallas_grad, pallas_hist, pallas_predict
    rng = np.random.default_rng(77)
    pos = rng.normal(0, 0.3, (6, 2, 2))
    dtv = {"2": np.concatenate([np.full((3, 1), 0.02),
                                np.full((3, 1), 0.5)])}
    batch = tdata.from_dict({"2": pos}, dt=dtv)
    vals = xp.generate_params(nb_states=2, D_max=1.0).resolve()
    Ds, Fs, rates, loc_err, pBL = xp.extract_arrays(vals, 2)
    tb = tables.build_tables(Ds, loc_err, Fs, rates, pBL, batch.dt,
                             cell_dims=(1.0,))
    args = (batch.positions, batch.lengths, batch.is_bleached, tb)
    ref = np.asarray(engine.forward(*args, window=5, min_len=2))
    got = np.asarray(pallas_engine.forward_pallas(*args, window=5,
                                                  min_len=2,
                                                  interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    lo, _ = pallas_predict.predict_pallas(*args, window=5, min_len=2,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(lo), ref, rtol=1e-5)
    hist = pallas_hist.hist_pallas(*args, window=5, min_len=2,
                                   interpret=True)
    assert np.isfinite(np.asarray(hist)).all()
    # gradient kernel: value must match the forward parity too
    pallas_grad.INTERPRET = True
    try:
        val = pallas_grad.neg_log_likelihood(
            batch.positions, batch.lengths, batch.is_bleached, tb,
            window=5, min_len=2)
        np.testing.assert_allclose(float(val), -ref.sum(), rtol=1e-5)
    finally:
        pallas_grad.INTERPRET = False


def test_fuzz_kernels_random_configs():
    """Randomized configs through the forward/posterior/histogram kernels
    vs the XLA engine (interpret mode): dims, window, lengths, loc-err
    form, and dt mode (constant / per-step / per-track) sampled together —
    the T=2 per-track-dt classifier bug hid exactly in such a corner."""
    import jax
    from extrack_tpu.ops import pallas_hist, pallas_predict
    rng = np.random.default_rng(515)
    for trial in range(6):
        S = 2 if rng.random() < 0.7 else 3
        W = int(rng.integers(3, 6 if S == 3 else 7))
        D = int(rng.integers(1, 4))
        T = int(rng.integers(max(3, W - 1), 10))
        B = int(rng.integers(3, 7))
        Ds = np.sort(rng.uniform(0.0, 0.2, S))
        Fs = rng.dirichlet(np.ones(S) * 3)
        rates = rng.uniform(0.05, 0.2, (S, S))
        np.fill_diagonal(rates, 0.0)
        dt_mode = rng.choice(["const", "per_step", "per_track"])
        dt = {"const": 0.02,
              "per_step": np.full((T - 1,), 0.02) * rng.uniform(
                  0.5, 1.5, T - 1),
              "per_track": 0.02 * rng.uniform(0.5, 1.5, (B, T - 1))
              }[dt_mode]
        loc_err = (0.02 if rng.random() < 0.7
                   else 0.015 + 0.02 * rng.random((B, T, D)))
        tb = tables.build_tables(
            jnp.asarray(Ds, jnp.float32), jnp.asarray(loc_err, jnp.float32),
            jnp.asarray(Fs, jnp.float32), jnp.asarray(rates, jnp.float32),
            jnp.asarray(0.1, jnp.float32), jnp.asarray(dt, jnp.float32),
            cell_dims=(0.8,))
        xs = rng.normal(0, 0.2, (B, T, D)).cumsum(1).astype(np.float32)
        lengths = rng.integers(2, T + 1, B).astype(np.int32)
        lengths[0] = T
        isbl = rng.integers(0, 2, B).astype(np.float32)
        args = (jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl), tb)
        msg = (f"trial {trial}: S={S} W={W} D={D} T={T} B={B} "
               f"dt={dt_mode} perpeak={np.ndim(loc_err) > 0}")
        ref = np.asarray(engine.forward(*args, window=W, min_len=2))
        got = np.asarray(pallas_engine.forward_pallas(
            *args, window=W, min_len=2, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=5e-5, atol=1e-5,
                                   err_msg="forward " + msg)
        lo, pr = pallas_predict.predict_pallas(*args, window=W, min_len=2,
                                               interpret=True)
        np.testing.assert_allclose(np.asarray(lo), ref, rtol=5e-5,
                                   atol=1e-5, err_msg="predict " + msg)
        ref_lo, ref_pr = engine.forward(*args, window=W, min_len=2,
                                        return_preds=True)
        mask = (np.arange(T)[None] < lengths[:, None])[..., None]
        np.testing.assert_allclose(np.asarray(pr) * mask,
                                   np.asarray(ref_pr) * mask,
                                   rtol=2e-4, atol=2e-4,
                                   err_msg="posteriors " + msg)
        h = np.asarray(pallas_hist.hist_pallas(*args, window=W, min_len=2,
                                               interpret=True))
        from extrack_tpu.histograms import window_segment_histogram
        href = np.asarray(window_segment_histogram(*args, window=W,
                                                   min_len=2))
        np.testing.assert_allclose(h, href, rtol=2e-4, atol=2e-4,
                                   err_msg="hist " + msg)


def test_pallas_legacy_ominor_layout():
    """window < 2*nb_substeps (A does not divide G) keeps the legacy
    o-minor register layout in the forward kernel — every other config
    now takes the o-major path, so this is the only coverage the legacy
    branches get; the gradient kernel refuses the config (XLA fallback)."""
    from extrack_tpu.ops import pallas_grad
    S, n, W = 2, 3, 4                        # A=8, G=2: G % A != 0
    xs, lengths, isbl, tb = _setup(77, S=S, n=n)
    ref = engine.forward(jnp.asarray(xs), jnp.asarray(lengths),
                         jnp.asarray(isbl, jnp.float32), tb,
                         window=W, nb_substeps=n, min_len=3)
    out = pallas_engine.forward_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=W, nb_substeps=n,
        min_len=3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert not pallas_grad.supports(9, 2, S, W, nb_substeps=n)
