"""Window-DP segment histogram (sort-free) vs exact enumeration + top-K."""
import numpy as np
import pytest

import jax.numpy as jnp

from extrack_tpu import histograms
from extrack_tpu.core import oracle, tables
from tests.test_engine import _sim_tracks


def _setup(rng, n, T):
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    rates = np.array([[0.0, 0.1], [0.15, 0.0]])
    tr = np.array([[.9, .1], [.15, .85]])
    xs, _ = _sim_tracks(rng, n, T, 2, Ds, tr, Fs, 0.02, 0.02)
    tb = tables.build_tables(Ds, 0.02, Fs, rates, 0.1, 0.02,
                             cell_dims=(0.8,), nb_substeps=1)
    tr_sub = np.asarray(tables.transition_matrix(jnp.asarray(rates)))
    return xs, tb, Ds, Fs, tr_sub


def test_window_histogram_matches_oracle_full_window():
    rng = np.random.default_rng(50)
    xs, tb, Ds, Fs, tr_sub = _setup(rng, 5, 6)
    lengths = np.array([6, 6, 5, 4, 6])
    isbl = np.array([1, 0, 1, 1, 1])
    got = np.asarray(histograms.window_segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl, float), tb,
        window=6, min_len=3))
    want = np.zeros_like(got)
    for i in range(5):
        h = oracle.segment_histogram(xs[i][:lengths[i]], 0.02, Ds, Fs,
                                     tr_sub, pBL=0.1,
                                     is_bleached=float(isbl[i]),
                                     cell_dims=(0.8,), dt=0.02, min_len=3)
        want[:h.shape[0]] += h
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_window_histogram_mass_conservation():
    # every frame belongs to exactly one counted segment:
    # sum_l l * hist[l-1, :].sum() == total number of frames
    rng = np.random.default_rng(51)
    xs, tb, *_ = _setup(rng, 8, 11)
    lengths = np.array([11, 10, 9, 8, 7, 6, 5, 4])
    isbl = np.ones(8)
    for W in (4, 6, 8):
        got = np.asarray(histograms.window_segment_histogram(
            jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl, float),
            tb, window=W, min_len=3))
        k = np.arange(1, got.shape[0] + 1)
        assert (k[:, None] * got).sum() == pytest.approx(lengths.sum(),
                                                         rel=1e-9), W
        assert (got >= -1e-12).all()


def test_window_histogram_close_to_topk_when_pruned():
    rng = np.random.default_rng(52)
    xs, tb, *_ = _setup(rng, 12, 12)
    lengths = np.full(12, 12)
    isbl = np.ones(12)
    exact = np.asarray(histograms.segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl, float), tb,
        max_nb_states=4096, min_len=3))
    windowed = np.asarray(histograms.window_segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl, float), tb,
        window=8, min_len=3))
    assert np.abs(windowed - exact).max() < 2e-2 * np.abs(exact).max()


def test_window_histogram_substeps2_matches_oracle():
    rng = np.random.default_rng(54)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    rates = np.array([[0.0, 0.1], [0.15, 0.0]])
    tr_sub = np.asarray(tables.transition_matrix(jnp.asarray(rates),
                                                 nb_substeps=2))
    xs, _ = _sim_tracks(rng, 4, 4, 2, Ds, tr_sub, Fs, 0.02, 0.02)
    lengths = np.array([4, 4, 3, 4])
    isbl = np.array([1, 0, 1, 1])
    tb = tables.build_tables(Ds, 0.02, Fs, rates, 0.1, 0.02,
                             cell_dims=(0.8,), nb_substeps=2)
    # window covers every sub-step ((T-1)*2+1 = 7) -> exact enumeration
    got = np.asarray(histograms.window_segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl, float), tb,
        window=7, min_len=3, nb_substeps=2))
    want = np.zeros_like(got)
    for i in range(4):
        h = oracle.segment_histogram(xs[i][:lengths[i]], 0.02, Ds, Fs,
                                     tr_sub, pBL=0.1,
                                     is_bleached=float(isbl[i]),
                                     cell_dims=(0.8,), dt=0.02, min_len=3,
                                     nb_substeps=2)
        want[:h.shape[0]] += h
    np.testing.assert_allclose(got, want, atol=1e-9)
    # mass conservation holds with substeps too
    k = np.arange(1, got.shape[0] + 1)
    assert (k[:, None] * got).sum() == pytest.approx(lengths.sum(),
                                                     rel=1e-9)


def test_len_hist_substeps2_runs():
    rng = np.random.default_rng(55)
    from extrack_tpu import params as xp
    xs, *_ = _setup(rng, 30, 8)
    spec = xp.generate_params(nb_states=2, LocErr_type=1,
                              estimated_LocErr=[0.02],
                              estimated_Ds=[0.0, 0.1],
                              estimated_Fs=[0.4, 0.6],
                              estimated_transition_rates=0.1)
    h = histograms.len_hist({"8": xs}, spec, 0.02,
                            cell_dims=(0.8, None, None),
                            nb_substeps=2, engine="window", window=4)
    assert h.shape == (8, 2)
    k = np.arange(1, 9)
    assert (k[:, None] * h).sum() == pytest.approx(30 * 8, rel=1e-6)


def test_len_hist_window_engine_matches_topk():
    rng = np.random.default_rng(53)
    from extrack_tpu import params as xp
    xs, *_ = _setup(rng, 40, 9)
    tracks = {"9": xs}
    spec = xp.generate_params(nb_states=2, LocErr_type=1,
                              estimated_LocErr=[0.02],
                              estimated_Ds=[0.0, 0.1],
                              estimated_Fs=[0.4, 0.6],
                              estimated_transition_rates=0.1)
    h_topk = histograms.len_hist(tracks, spec, 0.02,
                                 cell_dims=(0.8, None, None),
                                 max_nb_states=1024, engine="topk")
    h_win = histograms.len_hist(tracks, spec, 0.02,
                                cell_dims=(0.8, None, None),
                                engine="window", window=9)
    # both exact in this regime (2^9 sequences <= 1024; window == T)
    np.testing.assert_allclose(h_win, h_topk, atol=1e-8)
