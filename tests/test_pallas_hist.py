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


def test_hist_block_cap_conservative():
    """Regression: the cap must account for the kernel's 8-padded bin rows
    (TP) and harvest temporaries.  The old T-based formula returned 640 at
    the bench shape (T=10, K=128, S=2), where the real scoped-vmem use is
    ~106 KB/lane — 640 lanes exceeded the 64 MB Mosaic limit at compile on
    TPU.  Measured-safe bound at this shape: 512."""
    assert pallas_hist.hist_block_cap(10, 2, 2 ** 7, 2) <= 512
    # formula must track the padded row count: T=9..16 all pad to TP=16
    caps = {T: pallas_hist.hist_block_cap(T, 2, 2 ** 7, 2)
            for T in range(9, 17)}
    assert len(set(caps.values())) == 1
    # and stay monotone non-increasing in T
    caps_t = [pallas_hist.hist_block_cap(T, 2, 2 ** 7, 2)
              for T in (8, 16, 24, 32, 48)]
    assert all(a >= b for a, b in zip(caps_t, caps_t[1:]))
    # the measured 106 KB/lane reality: cap * per-lane-real must stay
    # under the 64 MB limit with margin at the bench shape
    cap = pallas_hist.hist_block_cap(10, 2, 2 ** 7, 2)
    assert cap * 106 * 1024 < 60 * 1024 * 1024
