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
