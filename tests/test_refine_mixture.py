"""Raw mixture refinement API (reference get_pos_PDF and consumers)."""
import numpy as np

import jax.numpy as jnp

from extrack_tpu import refine
from extrack_tpu.core import oracle
from tests.test_engine import _sim_tracks

RNG = np.random.default_rng(41)
DS = np.array([0.0, 0.1])
TR = np.array([[.9, .1], [.15, .85]])
DT, LOC = 0.02, 0.02


def _tracks(n=5, T=6):
    xs, _ = _sim_tracks(RNG, n, T, 2, DS, TR, np.array([.5, .5]), LOC, DT)
    return xs


def test_mixture_moments_match_oracle_full_window():
    xs = _tracks()
    n, T, _ = xs.shape
    d2 = 2.0 * DS * DT
    mu_c, var_c, lw, labels = refine.position_mixtures(
        jnp.asarray(xs), jnp.full((n,), T, jnp.int32),
        jnp.asarray(LOC ** 2), jnp.log(jnp.asarray(TR)), jnp.asarray(d2),
        window=T)
    mu, var = refine._moment_match_mixture(mu_c, var_c, lw)
    for i in range(n):
        want_mu, want_sig = oracle.refined_positions(xs[i], LOC, DS, TR,
                                                     dt=DT)
        np.testing.assert_allclose(np.asarray(mu[i]), want_mu, atol=1e-10)
        np.testing.assert_allclose(np.sqrt(np.asarray(var[i])), want_sig,
                                   atol=1e-10)
    assert labels.shape[0] == lw.shape[2]


def test_get_pos_pdf_lists_and_weights():
    xs = _tracks()
    n, T, D = xs.shape
    ds = np.sqrt(2.0 * DS * DT)
    means, stds, weights, Bs = refine.get_pos_PDF(
        xs, LOC, ds, np.array([.5, .5]), TR, frame_len=T)
    assert len(means) == T and len(stds) == T and len(weights) == T
    for k in range(T):
        C = weights[k].shape[1]
        assert means[k].shape == (n, C, D)
        assert stds[k].shape == (n, C, 1)
        assert Bs[k].shape == (C,)
        # at least one live component per position, stds positive there
        live = np.isfinite(weights[k])
        assert live.any(axis=1).all()
        assert (stds[k][live] > 0).all()
    # moment-matching the mixture reproduces position_refinement
    mus_ref, sigs_ref = refine.position_refinement(
        {str(T): xs}, LOC, ds, np.array([.5, .5]), TR, frame_len=T)
    for k in range(T):
        w = np.exp(weights[k] - weights[k].max(axis=1, keepdims=True))
        w = np.where(np.isfinite(weights[k]), w, 0.0)
        mu_k = (w[..., None] * means[k]).sum(1) / w.sum(1)[:, None]
        np.testing.assert_allclose(mu_k, mus_ref[str(T)][:, k], atol=1e-9)


def test_component_labels_agree_with_posteriors():
    # the weight-summed state labels at a position are a state posterior:
    # compare to the likelihood engine's posterior ranking
    xs = _tracks(n=8, T=6)
    n, T, _ = xs.shape
    ds = np.sqrt(2.0 * DS * DT)
    means, stds, weights, Bs = refine.get_pos_PDF(
        xs, LOC, ds, np.array([.5, .5]), TR, frame_len=T)
    k = T // 2
    w = np.exp(weights[k] - weights[k].max(axis=1, keepdims=True))
    w = np.where(np.isfinite(weights[k]), w, 0.0)
    post = np.stack([(w * (Bs[k][None] == s)).sum(1) for s in (0, 1)],
                    axis=1)
    post /= post.sum(1, keepdims=True)
    assert post.shape == (n, 2)
    assert np.all(post >= 0) and np.allclose(post.sum(1), 1.0)


def test_get_all_estimates_and_global_sigs():
    xs = _tracks(n=4, T=5)
    ds = np.sqrt(2.0 * DS * DT)
    out = refine.get_pos_PDF(xs, LOC, ds, np.array([.5, .5]), TR,
                             frame_len=5)
    means, stds, weights, Bs = out
    best_mus, best_sigs, best_Bs = refine.get_all_estimates(
        weights, Bs, means, stds)
    assert best_mus.shape == (4, 5, 2)
    assert best_sigs.shape == (4, 5, 1)
    assert best_Bs.shape == (4, 5)
    assert set(np.unique(best_Bs)) <= {0, 1}
    w_mus, w_sigs = refine.get_global_sigs_mus(means, stds, weights, idx=0)
    assert w_mus.shape == (5, 2) and w_sigs.shape == (5,)
    assert (w_sigs > 0).all()
    # the weighted mean must match the moment-matched refinement mean
    mus_ref, _ = refine.position_refinement(
        {"5": xs}, LOC, ds, np.array([.5, .5]), TR, frame_len=5)
    np.testing.assert_allclose(w_mus, mus_ref["5"][0], atol=1e-9)


def test_get_best_estimates_reduces_error():
    rng = np.random.default_rng(7)
    n, T = 150, 10
    loc_err = 0.05
    true = np.cumsum(rng.normal(0, np.sqrt(2 * DS[1] * DT), (n, T, 2)),
                     axis=1)
    obs = true + rng.normal(0, loc_err, true.shape)
    ds = np.sqrt(2.0 * DS * DT)
    mus, sigs = refine.get_best_estimates(obs, loc_err, ds,
                                          np.array([.5, .5]), TR,
                                          frame_len=6)
    assert mus.shape == obs.shape
    err_raw = np.mean((obs - true) ** 2)
    err_ref = np.mean((mus - true) ** 2)
    assert err_ref < err_raw
