"""Posterior kernel parity vs the XLA engine (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from extrack_tpu.core import engine, tables
from extrack_tpu.ops import pallas_predict
from tests.test_pallas import _setup


@pytest.mark.parametrize("S,W", [(2, 5), (2, 6), (3, 4)])
def test_predict_kernel_matches_engine(S, W):
    xs, lengths, isbl, tb = _setup(70 + S + W, n_tracks=20, T=9, S=S)
    logl_ref, preds_ref = engine.forward(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=W, min_len=3,
        return_preds=True)
    logl, preds = pallas_predict.predict_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=W, min_len=3,
        interpret=True)
    np.testing.assert_allclose(np.asarray(logl), np.asarray(logl_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(preds), np.asarray(preds_ref),
                               rtol=2e-3, atol=2e-4)
    # posteriors are normalized on valid frames, zero on padding
    valid = np.arange(xs.shape[1])[None, :] < np.asarray(lengths)[:, None]
    sums = np.asarray(preds).sum(-1)
    np.testing.assert_allclose(sums[valid], 1.0, atol=1e-3)
    assert np.all(np.abs(sums[~valid]) < 1e-6)


def test_predict_kernel_blocks_and_padding():
    xs, lengths, isbl, tb = _setup(77, n_tracks=300, T=7)
    logl_ref, preds_ref = engine.forward(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=4, min_len=3,
        return_preds=True)
    logl, preds = pallas_predict.predict_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=4, min_len=3,
        block=128, interpret=True)
    assert preds.shape == (300, 7, 2)
    np.testing.assert_allclose(np.asarray(logl), np.asarray(logl_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(preds), np.asarray(preds_ref),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("per_track", [False, True])
def test_predict_kernel_variable_dt(per_track):
    """Per-step / per-track dt streams through the posterior kernel."""
    from extrack_tpu.core import tables as ttables
    xs, lengths, isbl, _ = _setup(90 + per_track, n_tracks=24, T=9)
    rng = np.random.default_rng(5)
    B, T = xs.shape[0], xs.shape[1]
    dt = (rng.uniform(0.01, 0.05, (B, T - 1)) if per_track
          else rng.uniform(0.01, 0.05, (T - 1,)))
    tb = ttables.build_tables(
        jnp.asarray([0.0, 0.1]), jnp.asarray(0.02),
        jnp.asarray([0.4, 0.6]), jnp.asarray([[0.0, 0.1], [0.15, 0.0]]),
        jnp.asarray(0.1), jnp.asarray(dt), cell_dims=(0.8,))
    logl_ref, preds_ref = engine.forward(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=5, min_len=3,
        return_preds=True)
    logl, preds = pallas_predict.predict_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=5, min_len=3,
        interpret=True)
    np.testing.assert_allclose(np.asarray(logl), np.asarray(logl_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(preds), np.asarray(preds_ref),
                               rtol=2e-3, atol=2e-4)


def test_predict_kernel_per_peak_locerr():
    """Per-peak LocErr rides the streamed l2 table."""
    from extrack_tpu.core import tables as ttables
    xs, lengths, isbl, _ = _setup(99, n_tracks=20, T=8)
    rng = np.random.default_rng(3)
    loc_err = rng.uniform(0.01, 0.05, xs.shape)
    tb = ttables.build_tables(
        jnp.asarray([0.0, 0.1]), jnp.asarray(loc_err),
        jnp.asarray([0.4, 0.6]), jnp.asarray([[0.0, 0.1], [0.15, 0.0]]),
        jnp.asarray(0.1), jnp.asarray(0.02), cell_dims=(0.8,))
    logl_ref, preds_ref = engine.forward(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=5, min_len=3,
        return_preds=True)
    logl, preds = pallas_predict.predict_pallas(
        jnp.asarray(xs), jnp.asarray(lengths),
        jnp.asarray(isbl, jnp.float32), tb, window=5, min_len=3,
        interpret=True)
    np.testing.assert_allclose(np.asarray(logl), np.asarray(logl_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(preds), np.asarray(preds_ref),
                               rtol=2e-3, atol=2e-4)
