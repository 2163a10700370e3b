"""Pallas gradient kernel vs XLA autodiff (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from extrack_tpu.core import engine, tables
from extrack_tpu.ops import pallas_grad
from tests.test_engine import _sim_tracks


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_grad.INTERPRET = True
    yield
    pallas_grad.INTERPRET = False


def _theta_objective(xs, lengths, isbl, use_pallas, W=4, n=1):
    Fs = jnp.asarray([0.4, 0.6], jnp.float32)

    def obj(theta):
        Ds = jnp.stack([theta[0], theta[1]])
        rates = jnp.stack([jnp.stack([0.0 * theta[2], theta[2]]),
                           jnp.stack([theta[3], 0.0 * theta[3]])])
        tb = tables.build_tables(Ds, theta[4], Fs, rates, theta[5],
                                 jnp.asarray(0.02, jnp.float32),
                                 cell_dims=(0.8,), nb_substeps=n)
        if use_pallas:
            return pallas_grad.neg_log_likelihood(
                xs, lengths, isbl, tb, window=W, nb_substeps=n, min_len=3)
        return -jnp.sum(engine.forward(xs, lengths, isbl, tb, window=W,
                                       nb_substeps=n, min_len=3))

    return obj


@pytest.mark.parametrize("n,W", [(1, 4), (2, 4)])
def test_grad_kernel_matches_xla(n, W):
    rng = np.random.default_rng(80 + n)
    Ds = np.array([0.0, 0.1])
    tr = np.array([[.9, .1], [.15, .85]])
    xs, _ = _sim_tracks(rng, 6, 7, 2, Ds, tr, np.array([.4, .6]), 0.02, 0.02)
    lengths = np.array([7, 5, 7, 3, 6, 7])
    isbl = (lengths < 7).astype(float)
    xs = jnp.asarray(xs, jnp.float32)
    lengths = jnp.asarray(lengths)
    isbl = jnp.asarray(isbl, jnp.float32)
    theta = jnp.asarray([0.001, 0.1, 0.1, 0.15, 0.02, 0.1], jnp.float32)

    v_ref, g_ref = jax.value_and_grad(
        _theta_objective(xs, lengths, isbl, False, W, n))(theta)
    v_pl, g_pl = jax.value_and_grad(
        _theta_objective(xs, lengths, isbl, True, W, n))(theta)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)
