"""Engine vs exact-enumeration oracle parity tests.

When the register window covers the whole hidden chain (W >= (T-1)*n + 1) the
fixed-window engine performs no lossy fusion and must match the brute-force
oracle to float64 precision.  Shorter windows reproduce the reference's
``frame_len`` approximation and must stay close to exact.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from extrack_tpu.core import engine, oracle, tables


def _sim_tracks(rng, n_tracks, T, D, Ds, tr, Fs, loc_err, dt):
    """Tiny direct simulator (frame-resolution states) for test inputs."""
    S = len(Ds)
    xs = np.zeros((n_tracks, T, D))
    states = np.zeros((n_tracks, T), dtype=int)
    for i in range(n_tracks):
        s = rng.choice(S, p=Fs)
        r = rng.normal(0, 1, D)
        for t in range(T):
            states[i, t] = s
            xs[i, t] = r + rng.normal(0, loc_err, D)
            s_next = rng.choice(S, p=tr[s])
            step_sig = np.sqrt((2 * Ds[s] * dt + 2 * Ds[s_next] * dt) / 2)
            r = r + rng.normal(0, step_sig, D)
            s = s_next
    return xs, states


def _run_both(xs, lengths, is_bleached, Ds, Fs, rates, loc_err, dt, pBL,
              cell_dims, n, W, min_len, matrix_type=1):
    tr_sub = np.asarray(tables.transition_matrix(
        jnp.asarray(rates), nb_substeps=n, matrix_type=matrix_type))
    tb = tables.build_tables(Ds, loc_err, Fs, rates, pBL, dt,
                             cell_dims=cell_dims, nb_substeps=n,
                             matrix_type=matrix_type)
    got = engine.forward(jnp.asarray(xs), jnp.asarray(lengths),
                         jnp.asarray(is_bleached, dtype=float), tb,
                         window=W, nb_substeps=n, min_len=min_len)
    want = np.array([
        oracle.track_log_likelihood(
            xs[i][:lengths[i]],
            loc_err if np.ndim(loc_err) <= 1 else loc_err[i][:lengths[i]],
            Ds, Fs, tr_sub, pBL=pBL, is_bleached=float(is_bleached[i]),
            cell_dims=cell_dims, nb_substeps=n, dt=dt, min_len=min_len)
        if lengths[i] >= 2 else 0.0
        for i in range(len(xs))])
    return np.asarray(got), want


def test_two_state_exact_window():
    rng = np.random.default_rng(3)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    rates = np.array([[0.0, 0.1], [0.15, 0.0]])
    xs, _ = _sim_tracks(rng, 5, 6, 2, Ds, np.array([[.9, .1], [.15, .85]]),
                        Fs, 0.02, 0.02)
    lengths = np.full(5, 6)
    isbl = np.array([1, 1, 0, 1, 0])
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, 0.02, 0.02,
                          0.1, (0.8,), n=1, W=6, min_len=3)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_three_state_exact_window():
    rng = np.random.default_rng(4)
    Ds = np.array([0.001, 0.05, 0.3])
    Fs = np.array([0.3, 0.4, 0.3])
    rates = np.full((3, 3), 0.08)
    tr = np.array([[.8, .1, .1], [.1, .8, .1], [.1, .1, .8]])
    xs, _ = _sim_tracks(rng, 4, 5, 2, Ds, tr, Fs, 0.02, 0.02)
    lengths = np.full(4, 5)
    isbl = np.ones(4)
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, 0.02, 0.02,
                          0.1, (1.0,), n=1, W=5, min_len=3)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_five_state_exact_window():
    # the reference tutorial calls ~5 states a day-scale job (Tutorial md
    # cell 58); here the fixed register covers it like any other S —
    # exact-window parity vs the enumeration oracle at K = 5^4 = 625
    rng = np.random.default_rng(17)
    Ds = np.array([0.0, 0.02, 0.08, 0.2, 0.5])
    Fs = np.full(5, 0.2)
    rates = np.full((5, 5), 0.06) - np.diag(np.full(5, 0.06))
    tr = np.full((5, 5), 0.05) + np.diag(np.full(5, 0.75))
    xs, _ = _sim_tracks(rng, 3, 4, 2, Ds, tr, Fs, 0.02, 0.02)
    lengths = np.full(3, 4)
    isbl = np.array([1, 0, 1])
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, 0.02, 0.02,
                          0.1, (1.0,), n=1, W=4, min_len=3)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_substeps_exact_window():
    rng = np.random.default_rng(5)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.5, 0.5])
    rates = np.array([[0.0, 0.2], [0.3, 0.0]])
    xs, _ = _sim_tracks(rng, 3, 4, 2, Ds, np.array([[.9, .1], [.15, .85]]),
                        Fs, 0.02, 0.02)
    lengths = np.full(3, 4)
    isbl = np.array([1, 0, 1])
    # hidden chain length (T-1)*n+1 = 7 -> W=7 is exact
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, 0.02, 0.02,
                          0.1, (0.5,), n=2, W=7, min_len=3)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_three_substeps_exact_window():
    rng = np.random.default_rng(13)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.5, 0.5])
    rates = np.array([[0.0, 0.3], [0.4, 0.0]])
    xs, _ = _sim_tracks(rng, 2, 3, 2, Ds, np.array([[.9, .1], [.15, .85]]),
                        Fs, 0.02, 0.02)
    lengths = np.full(2, 3)
    isbl = np.array([1, 0])
    # hidden chain length (T-1)*n+1 = 7 -> W=7 exact
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, 0.02, 0.02,
                          0.1, (0.5,), n=3, W=7, min_len=2)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_mixed_lengths_and_padding():
    rng = np.random.default_rng(6)
    Ds, Fs = np.array([0.0, 0.08]), np.array([0.5, 0.5])
    rates = np.array([[0.0, 0.1], [0.1, 0.0]])
    xs, _ = _sim_tracks(rng, 6, 7, 2, Ds, np.array([[.9, .1], [.1, .9]]),
                        Fs, 0.02, 0.02)
    lengths = np.array([7, 5, 3, 2, 6, 0])   # incl. an empty padded slot
    xs[5] = 0.0
    isbl = np.array([0, 1, 1, 1, 1, 0])
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, 0.02, 0.02,
                          0.1, (1.0,), n=1, W=7, min_len=2)
    assert got[5] == 0.0
    np.testing.assert_allclose(got[:5], want[:5], rtol=1e-10, atol=1e-10)


def test_per_peak_loc_err_and_per_dim():
    rng = np.random.default_rng(7)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    rates = np.array([[0.0, 0.1], [0.15, 0.0]])
    xs, _ = _sim_tracks(rng, 3, 5, 2, Ds, np.array([[.9, .1], [.15, .85]]),
                        Fs, 0.02, 0.02)
    loc_err = 0.015 + 0.02 * rng.random((3, 5, 2))
    lengths = np.full(3, 5)
    isbl = np.ones(3)
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, loc_err, 0.02,
                          0.1, (0.8,), n=1, W=5, min_len=3)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_window_approximation_close_to_exact():
    rng = np.random.default_rng(8)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    rates = np.array([[0.0, 0.1], [0.15, 0.0]])
    xs, _ = _sim_tracks(rng, 8, 10, 2, Ds, np.array([[.9, .1], [.15, .85]]),
                        Fs, 0.02, 0.02)
    lengths = np.full(8, 10)
    isbl = np.ones(8)
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, 0.02, 0.02,
                          0.1, (0.8,), n=1, W=5, min_len=3)
    # fused-window approximation: not exact, but close (the reference's own
    # frame_len fusion carries the same class of error, tracking.py:357)
    np.testing.assert_allclose(got, want, rtol=1e-2)
    assert np.max(np.abs(got - want) / np.abs(want)) > 1e-8


def test_posteriors_exact_window():
    rng = np.random.default_rng(9)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    rates = np.array([[0.0, 0.1], [0.15, 0.0]])
    xs, _ = _sim_tracks(rng, 4, 6, 2, Ds, np.array([[.9, .1], [.15, .85]]),
                        Fs, 0.02, 0.02)
    lengths = np.array([6, 6, 4, 6])
    isbl = np.array([1, 0, 1, 1])
    tr_sub = np.asarray(tables.transition_matrix(jnp.asarray(rates)))
    tb = tables.build_tables(Ds, 0.02, Fs, rates, 0.1, 0.02,
                             cell_dims=(0.8,), nb_substeps=1)
    logl, preds = engine.forward(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl, dtype=float),
        tb, window=6, nb_substeps=1, min_len=3, return_preds=True)
    for i in range(4):
        want_l, want_p = oracle.track_log_likelihood(
            xs[i][:lengths[i]], 0.02, Ds, Fs, tr_sub, pBL=0.1,
            is_bleached=float(isbl[i]), cell_dims=(0.8,), nb_substeps=1,
            dt=0.02, min_len=3, return_posteriors=True)
        np.testing.assert_allclose(float(logl[i]), want_l, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(preds[i][:lengths[i]]),
                                   want_p, atol=1e-10)
        assert np.all(np.asarray(preds[i][lengths[i]:]) == 0.0)


def test_three_state_posteriors_exact_window():
    rng = np.random.default_rng(12)
    Ds = np.array([0.001, 0.05, 0.3])
    Fs = np.array([0.3, 0.4, 0.3])
    rates = np.full((3, 3), 0.08)
    tr = np.array([[.8, .1, .1], [.1, .8, .1], [.1, .1, .8]])
    xs, _ = _sim_tracks(rng, 3, 5, 2, Ds, tr, Fs, 0.02, 0.02)
    lengths = np.array([5, 4, 5])
    isbl = np.array([1, 1, 0])
    tr_sub = np.asarray(tables.transition_matrix(jnp.asarray(rates)))
    tb = tables.build_tables(Ds, 0.02, Fs, rates, 0.1, 0.02,
                             cell_dims=(1.0,), nb_substeps=1)
    logl, preds = engine.forward(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl, dtype=float),
        tb, window=5, nb_substeps=1, min_len=3, return_preds=True)
    for i in range(3):
        want_l, want_p = oracle.track_log_likelihood(
            xs[i][:lengths[i]], 0.02, Ds, Fs, tr_sub, pBL=0.1,
            is_bleached=float(isbl[i]), cell_dims=(1.0,), nb_substeps=1,
            dt=0.02, min_len=3, return_posteriors=True)
        np.testing.assert_allclose(float(logl[i]), want_l, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(preds[i][:lengths[i]]),
                                   want_p, atol=1e-10)


def test_three_dims_exact_window():
    rng = np.random.default_rng(11)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    rates = np.array([[0.0, 0.1], [0.15, 0.0]])
    xs, _ = _sim_tracks(rng, 3, 5, 3, Ds, np.array([[.9, .1], [.15, .85]]),
                        Fs, 0.02, 0.02)
    # per-dim localization error (x/y shared, z larger)
    loc_err = np.array([0.02, 0.02, 0.05])
    lengths = np.full(3, 5)
    isbl = np.ones(3)
    got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, loc_err, 0.02,
                          0.1, (0.5, 3.0), n=1, W=5, min_len=3)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_gradients_finite():
    rng = np.random.default_rng(10)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    xs, _ = _sim_tracks(rng, 4, 8, 2, Ds, np.array([[.9, .1], [.15, .85]]),
                        Fs, 0.02, 0.02)
    lengths = np.full(4, 8)
    isbl = np.ones(4)

    def objective(theta):
        Ds_, rates_, locerr_ = theta
        tb = tables.build_tables(Ds_, locerr_, jnp.asarray(Fs), rates_,
                                 0.1, 0.02, cell_dims=(0.8,), nb_substeps=1)
        return -jnp.sum(engine.forward(
            jnp.asarray(xs), jnp.asarray(lengths),
            jnp.asarray(isbl, dtype=float), tb, window=4, nb_substeps=1,
            min_len=3))

    theta = (jnp.array([0.001, 0.1]),
             jnp.array([[0.0, 0.1], [0.15, 0.0]]), jnp.asarray(0.02))
    val, grads = jax.value_and_grad(objective)(theta)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))


def test_float32_forbidden_transition_no_nan():
    """float32 (the production TPU dtype) with a FORBIDDEN transition
    (rate 0 -> log_trans = -inf): the fusion's division guard must not
    underflow to 0.0 (regression: the literal 1e-300 is zero in float32,
    so an all-(-inf) group produced 0/0 = NaN poisoning every track)."""
    import jax.numpy as jnp
    from extrack_tpu.core import tables as ttables
    rng = np.random.default_rng(91)
    Ds = np.array([0.0, 0.05, 0.3], np.float32)
    Fs = np.array([0.3, 0.4, 0.3], np.float32)
    rates = np.array([[0.0, 0.1, 0.0],       # 0 -> 2 forbidden
                      [0.1, 0.0, 0.1],
                      [0.0, 0.1, 0.0]], np.float32)   # 2 -> 0 forbidden
    xs, _ = _sim_tracks(rng, 8, 9, 2, np.array([0.0, 0.05, 0.3]),
                        np.full((3, 3), 1 / 3),
                        np.array([0.3, 0.4, 0.3]), 0.02, 0.02)
    xs = xs.astype(np.float32)
    lengths = np.full(8, 9, np.int32)
    tb = ttables.build_tables(
        jnp.asarray(Ds), jnp.asarray(0.02, jnp.float32), jnp.asarray(Fs),
        jnp.asarray(rates), jnp.asarray(0.1, jnp.float32),
        jnp.asarray(0.02, jnp.float32), cell_dims=(0.8,))
    out = engine.forward(jnp.asarray(xs), jnp.asarray(lengths),
                         jnp.zeros(8, jnp.float32), tb, window=4, min_len=3)
    assert np.asarray(out).dtype == np.float32
    assert np.isfinite(np.asarray(out)).all(), np.asarray(out)

    # the histogram window engine shares the fusion via engine.branch_fuse
    from extrack_tpu import histograms as thist
    hist = thist.window_segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.zeros(8, jnp.float32),
        tb, window=4, min_len=3)
    assert np.isfinite(np.asarray(hist)).all()

    # all four Pallas kernels: build_tables floors log(0) to a finite cap
    # so the kernels' max-shifted sums never hit inf - inf = NaN
    from extrack_tpu.ops import (pallas_engine, pallas_grad, pallas_hist,
                                 pallas_predict)
    args = (jnp.asarray(xs), jnp.asarray(lengths), jnp.zeros(8, jnp.float32),
            tb)
    ref = np.asarray(out)
    got = np.asarray(pallas_engine.forward_pallas(*args, window=4,
                                                  min_len=3, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4)
    lo, preds = pallas_predict.predict_pallas(*args, window=4, min_len=3,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(lo), ref, rtol=2e-4)
    assert np.isfinite(np.asarray(preds)).all()
    h2 = pallas_hist.hist_pallas(*args, window=4, min_len=3, interpret=True)
    assert np.isfinite(np.asarray(h2)).all()
    pallas_grad.INTERPRET = True
    try:
        val = pallas_grad.neg_log_likelihood(*args, window=4, min_len=3)
        np.testing.assert_allclose(float(val), -ref.sum(), rtol=2e-3)
    finally:
        pallas_grad.INTERPRET = False

    # gradients stay finite differentiating THROUGH build_tables with zero
    # rates under expm mixing (a plain maximum(log(p), cap) would NaN)
    import jax

    def obj(r):
        tb2 = ttables.build_tables(
            jnp.asarray([0.0, 0.05, 0.3]), 0.02,
            jnp.asarray([0.3, 0.4, 0.3]), r, 0.1, 0.02,
            cell_dims=(0.8,), matrix_type=2)
        return -jnp.sum(engine.forward(
            jnp.asarray(xs, jnp.float64), jnp.asarray(lengths),
            jnp.zeros(8), tb2, window=4, min_len=3))

    g = jax.grad(obj)(jnp.asarray(rates, jnp.float64))
    assert np.isfinite(np.asarray(g)).all()


def test_fuzz_random_configs_exact_window():
    """Randomized sweep of the whole config space (state count, substeps,
    dims, lengths, matrix type, loc-err form, censoring, min_len) against
    the exact-enumeration oracle with window = T (exact regime).  Catches
    interactions the fixed-case tests don't enumerate."""
    rng = np.random.default_rng(2024)
    for trial in range(10):
        S = int(rng.integers(2, 4))
        n = int(rng.integers(1, 3)) if S == 2 else 1
        D = int(rng.integers(1, 4))
        # n=2 caps T at 5 (W = 9 -> 2^9 oracle sequences stays cheap)
        T = int(rng.integers(max(3, n + 2), 6 if n == 2 else 7))
        B = int(rng.integers(2, 5))
        mt = int(rng.integers(0, 5))
        Ds = np.sort(rng.uniform(0.0, 0.3, S))
        Fs = rng.dirichlet(np.ones(S) * 3)
        rates = rng.uniform(0.02, 0.25, (S, S))
        np.fill_diagonal(rates, 0.0)
        pBL = float(rng.uniform(0.02, 0.3))
        loc_err = (float(rng.uniform(0.01, 0.05)) if rng.random() < 0.7
                   else rng.uniform(0.01, 0.05, D))
        cell_dims = ((0.8,) if rng.random() < 0.7 else (0.6, 1.2))
        min_len = int(rng.integers(2, 4))
        tr_frame = np.asarray(tables.transition_matrix(
            jnp.asarray(rates), nb_substeps=1, matrix_type=mt))
        # normalized copy for the SIMULATOR only (np.random.choice needs
        # exact row sums; parity is checked under the un-normalized model)
        tr_sim = np.clip(tr_frame, 1e-12, None)
        tr_sim = tr_sim / tr_sim.sum(1, keepdims=True)
        xs, _ = _sim_tracks(rng, B, T, D, Ds, tr_sim,
                            Fs / Fs.sum(), 0.03, 0.02)
        lengths = rng.integers(2, T + 1, B)
        lengths[0] = T
        if rng.random() < 0.4:
            lengths[-1] = 0            # padded (empty) slot
        isbl = rng.integers(0, 2, B).astype(float)
        W = (T - 1) * n + 1       # cover the whole hidden sub-step chain
        got, want = _run_both(xs, lengths, isbl, Ds, Fs, rates, loc_err,
                              0.02, pBL, cell_dims, n=n, W=W,
                              min_len=min_len, matrix_type=mt)
        mask = lengths >= 2
        np.testing.assert_allclose(
            got[mask], want[mask], rtol=1e-9, atol=1e-9,
            err_msg=f"trial {trial}: S={S} n={n} D={D} T={T} mt={mt} "
                    f"min_len={min_len} cell={cell_dims}")
