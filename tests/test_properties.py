"""Invariance and stress properties of the likelihood engine."""
import numpy as np
import pytest

import jax.numpy as jnp

from extrack_tpu import auto_fitting, simulate
from extrack_tpu.core import engine, tables
from tests.test_engine import _sim_tracks


def _tb(Ds=(0.0, 0.1), loc_err=0.02, pBL=0.1, cell=(0.8,)):
    return tables.build_tables(np.asarray(Ds), loc_err,
                               np.array([0.4, 0.6]),
                               np.array([[0.0, 0.1], [0.15, 0.0]]), pBL,
                               0.02, cell_dims=cell)


def _logl(xs, lengths, isbl, tb, W=4):
    return np.asarray(engine.forward(
        jnp.asarray(xs), jnp.asarray(lengths), jnp.asarray(isbl, float),
        tb, window=W, nb_substeps=1, min_len=3))


def test_track_permutation_invariance():
    rng = np.random.default_rng(90)
    xs, _ = _sim_tracks(rng, 8, 7, 2, np.array([0.0, 0.1]),
                        np.array([[.9, .1], [.15, .85]]),
                        np.array([.4, .6]), 0.02, 0.02)
    lengths = rng.integers(3, 8, 8)
    isbl = np.ones(8)
    base = _logl(xs, lengths, isbl, _tb())
    perm = rng.permutation(8)
    shuffled = _logl(xs[perm], lengths[perm], isbl[perm], _tb())
    np.testing.assert_allclose(shuffled, base[perm], rtol=1e-12)


def test_translation_invariance():
    # only displacements matter: shifting a whole track leaves logL unchanged
    rng = np.random.default_rng(91)
    xs, _ = _sim_tracks(rng, 4, 6, 2, np.array([0.0, 0.1]),
                        np.array([[.9, .1], [.15, .85]]),
                        np.array([.4, .6]), 0.02, 0.02)
    lengths = np.full(4, 6)
    isbl = np.ones(4)
    base = _logl(xs, lengths, isbl, _tb())
    shifted = _logl(xs + np.array([13.7, -42.0]), lengths, isbl, _tb())
    np.testing.assert_allclose(shifted, base, rtol=1e-9)


def test_padding_invariance():
    # extra time padding and extra empty tracks change nothing
    rng = np.random.default_rng(92)
    xs, _ = _sim_tracks(rng, 5, 6, 2, np.array([0.0, 0.1]),
                        np.array([[.9, .1], [.15, .85]]),
                        np.array([.4, .6]), 0.02, 0.02)
    lengths = np.array([6, 5, 4, 3, 6])
    isbl = np.ones(5)
    base = _logl(xs, lengths, isbl, _tb())
    xs_pad = np.concatenate([np.pad(xs, ((0, 3), (0, 4), (0, 0))),
                             ], axis=0)
    lengths_pad = np.concatenate([lengths, [0, 0, 0]])
    isbl_pad = np.concatenate([isbl, [0, 0, 0]])
    padded = _logl(xs_pad, lengths_pad, isbl_pad, _tb())
    np.testing.assert_allclose(padded[:5], base, rtol=1e-12)
    assert np.all(padded[5:] == 0.0)


def test_numerical_stress_finite():
    # tiny localization error, huge diffusion contrast, long tracks
    rng = np.random.default_rng(93)
    xs, _ = _sim_tracks(rng, 6, 30, 2, np.array([1e-8, 5.0]),
                        np.array([[.95, .05], [.05, .95]]),
                        np.array([.5, .5]), 1e-4, 0.02)
    lengths = np.full(6, 30)
    isbl = np.ones(6)
    tb = tables.build_tables(np.array([1e-8, 5.0]), 1e-4,
                             np.array([0.5, 0.5]),
                             np.array([[0.0, 0.05], [0.05, 0.0]]), 0.1,
                             0.02, cell_dims=(0.8,))
    out = _logl(xs, lengths, isbl, tb, W=6)
    assert np.all(np.isfinite(out))


def test_more_states_never_reduce_max_likelihood_and_bic_picks_two():
    # model selection on clean 2-state data must prefer 2 states
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=400, max_track_len=10, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=94)
    # same window for every state count so the logLs are comparable, and
    # multi-start to escape the 3-state default-init local optimum
    ms = auto_fitting.model_selection(tracks, 0.02, state_range=(2, 3),
                                      cell_dims=(0.5,),
                                      frame_lens={2: 4, 3: 4}, n_starts=2)
    assert ms.best_nb_states == 2
    # the 3-state model nests the 2-state model: logL shouldn't collapse
    assert ms.logls[3] > ms.logls[2] - 0.02 * abs(ms.logls[2])
