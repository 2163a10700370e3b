"""Segment-length histogram engine vs exact enumeration."""
import numpy as np
import pytest

import jax.numpy as jnp

from extrack_tpu import histograms, simulate
from extrack_tpu.core import oracle, tables
from tests.test_engine import _sim_tracks


def test_histogram_matches_oracle():
    rng = np.random.default_rng(20)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    rates = np.array([[0.0, 0.1], [0.15, 0.0]])
    tr = np.array([[.9, .1], [.15, .85]])
    xs, _ = _sim_tracks(rng, 5, 6, 2, Ds, tr, Fs, 0.02, 0.02)
    lengths = np.array([6, 6, 5, 4, 6])
    isbl = np.array([1, 0, 1, 1, 1])
    tr_sub = np.asarray(tables.transition_matrix(jnp.asarray(rates)))
    tb = tables.build_tables(Ds, 0.02, Fs, rates, 0.1, 0.02,
                             cell_dims=(0.8,), nb_substeps=1)
    # register large enough to hold all 2^6 sequences -> exact
    got = np.asarray(histograms.segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl, float), tb,
        max_nb_states=128, min_len=3))
    want = np.zeros_like(got)
    for i in range(5):
        h = oracle.segment_histogram(xs[i][:lengths[i]], 0.02, Ds, Fs,
                                     tr_sub, pBL=0.1,
                                     is_bleached=float(isbl[i]),
                                     cell_dims=(0.8,), dt=0.02, min_len=3)
        want[:h.shape[0]] += h
    np.testing.assert_allclose(got, want, atol=1e-9)
    # every track contributes exactly (T_i's worth of frames) of total mass:
    # sum_k k * hist[k-1].sum() == sum of track lengths
    k = np.arange(1, got.shape[0] + 1)
    assert (k[:, None] * got).sum() == pytest.approx(lengths.sum(), rel=1e-9)


def test_histogram_pruned_close_to_exact():
    rng = np.random.default_rng(21)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    rates = np.array([[0.0, 0.1], [0.15, 0.0]])
    tr = np.array([[.9, .1], [.15, .85]])
    xs, _ = _sim_tracks(rng, 6, 10, 2, Ds, tr, Fs, 0.02, 0.02)
    lengths = np.full(6, 10)
    isbl = np.ones(6)
    tb = tables.build_tables(Ds, 0.02, Fs, rates, 0.1, 0.02,
                             cell_dims=(0.8,), nb_substeps=1)
    exact = np.asarray(histograms.segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl, float), tb,
        max_nb_states=1024, min_len=3))
    pruned = np.asarray(histograms.segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl, float), tb,
        max_nb_states=128, min_len=3))
    assert np.abs(pruned - exact).max() < 5e-3 * np.abs(exact).max()


def test_len_hist_and_ground_truth():
    tracks, states, _ = simulate.sim_fov(
        nb_tracks=300, max_track_len=10, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=5)
    from extrack_tpu import params as xp
    spec = xp.generate_params(nb_states=2, LocErr_type=1,
                              estimated_LocErr=[0.02],
                              estimated_Ds=[0.0, 0.08],
                              estimated_Fs=[0.5, 0.5],
                              estimated_transition_rates=0.1)
    hist = histograms.len_hist(tracks, spec, 0.02,
                               cell_dims=(0.5, None, None), nb_states=2,
                               max_nb_states=256)
    gt = histograms.ground_truth_hist(states, 2)
    assert hist.shape == gt.shape == (10, 2)
    # posterior-weighted and ground-truth histograms should be similar:
    # compare normalized distributions per state
    h = hist / hist.sum()
    g = gt / gt.sum()
    assert np.abs(h - g).max() < 0.1
    # duration distributions should decay (more short segments than long)
    assert hist[0].sum() > hist[5].sum()


def test_topk_engine_substeps2_matches_window_exact():
    """topk engine with nb_substeps=2 == exact window engine on short
    tracks with an exhaustive register."""
    import jax.numpy as jnp
    from extrack_tpu.core import tables as ttables
    rng = np.random.default_rng(12)
    B, T, D, S, n = 10, 6, 2, 2, 2
    xs = jnp.asarray(np.cumsum(rng.normal(0, 0.05, (B, T, D)), axis=1))
    lengths = jnp.asarray(rng.integers(3, T + 1, B), jnp.int32)
    isbl = (lengths < T).astype(xs.dtype)
    tb = ttables.build_tables(
        jnp.asarray([0.0, 0.1]), jnp.asarray(0.02), jnp.asarray([0.4, 0.6]),
        jnp.asarray([[0.0, 0.1], [0.15, 0.0]]), jnp.asarray(0.1),
        jnp.asarray(0.02), cell_dims=(0.8,), nb_substeps=n)
    # exhaustive: S^(1 + n*(T-1)) = 2^11 sequences
    h_topk = histograms.segment_histogram(
        xs, lengths, isbl, tb, max_nb_states=2048, min_len=3,
        nb_substeps=n)
    # window engine exact when the register covers the whole track
    h_win = histograms.window_segment_histogram(
        xs, lengths, isbl, tb, window=n * (T - 1) + 1, min_len=3,
        nb_substeps=n)
    np.testing.assert_allclose(np.asarray(h_topk), np.asarray(h_win),
                               rtol=1e-8, atol=1e-10)
