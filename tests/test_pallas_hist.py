"""Histogram kernel parity vs the XLA window-DP engine (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from extrack_tpu import histograms
from extrack_tpu.ops import pallas_hist
from tests.test_pallas import _setup


@pytest.mark.parametrize("S,W", [(2, 5), (2, 7), (3, 4)])
def test_hist_kernel_matches_engine(S, W):
    xs, lengths, isbl, tb = _setup(90 + S + W, n_tracks=24, T=9, S=S)
    ref = histograms.window_segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=W, min_len=3)
    got = pallas_hist.hist_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=W, min_len=3,
        interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)
    # mass conservation: expected frames = sum_l l * count_l per track sum
    frames = float((np.asarray(got)
                    * np.arange(1, xs.shape[1] + 1)[:, None]).sum())
    np.testing.assert_allclose(frames, float(np.asarray(lengths).sum()),
                               rtol=2e-3)


def test_hist_kernel_blocks_and_padding():
    xs, lengths, isbl, tb = _setup(95, n_tracks=300, T=7)
    ref = histograms.window_segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=4, min_len=3)
    got = pallas_hist.hist_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=4, min_len=3,
        block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("per_track", [False, True])
def test_hist_kernel_variable_dt(per_track):
    """Per-step / per-track dt streams through the histogram kernel."""
    from extrack_tpu.core import tables as ttables
    xs, lengths, isbl, _ = _setup(70 + per_track, n_tracks=24, T=9)
    rng = np.random.default_rng(4)
    B, T = xs.shape[0], xs.shape[1]
    dt = (rng.uniform(0.01, 0.05, (B, T - 1)) if per_track
          else rng.uniform(0.01, 0.05, (T - 1,)))
    tb = ttables.build_tables(
        jnp.asarray([0.0, 0.1]), jnp.asarray(0.02),
        jnp.asarray([0.4, 0.6]), jnp.asarray([[0.0, 0.1], [0.15, 0.0]]),
        jnp.asarray(0.1), jnp.asarray(dt), cell_dims=(0.8,))
    ref = histograms.window_segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=5, min_len=3)
    got = pallas_hist.hist_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=5, min_len=3,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_hist_kernel_per_peak_locerr():
    from extrack_tpu.core import tables as ttables
    xs, lengths, isbl, _ = _setup(71, n_tracks=20, T=8)
    rng = np.random.default_rng(6)
    loc_err = rng.uniform(0.01, 0.05, xs.shape)
    tb = ttables.build_tables(
        jnp.asarray([0.0, 0.1]), jnp.asarray(loc_err),
        jnp.asarray([0.4, 0.6]), jnp.asarray([[0.0, 0.1], [0.15, 0.0]]),
        jnp.asarray(0.1), jnp.asarray(0.02), cell_dims=(0.8,))
    ref = histograms.window_segment_histogram(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=5, min_len=3)
    got = pallas_hist.hist_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=5, min_len=3,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)
