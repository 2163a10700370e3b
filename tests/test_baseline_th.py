"""Threshold-fusion baseline sanity: the transcription of the reference's
default pruning (P_Cs_inter_bound_stats_th) must reduce to the exact
recursion when pruning is disabled, and stay close to it at defaults."""
import numpy as np

from extrack_tpu import baselines


def _sim(seed, B=12, T=8, D=2):
    rng = np.random.default_rng(seed)
    return np.cumsum(rng.normal(0, 0.04, (B, T, D)), axis=1)


PARAMS = dict(loc_err=0.02, ds=np.array([0.0, 0.06]),
              Fs=np.array([0.4, 0.6]),
              TrMat=np.array([[0.9, 0.1], [0.2, 0.8]]),
              pBL=0.05, isBL=1, cell_dims=(0.5,), min_len=3)


def test_threshold_off_matches_exact():
    Cs = _sim(0)
    T = Cs.shape[1]
    exact = baselines.reference_log_likelihood(Cs, frame_len=T, **PARAMS)
    th = baselines.reference_log_likelihood_th(
        Cs, frame_len=T, threshold=1e-9, max_nb_states=10 ** 9, **PARAMS)
    np.testing.assert_allclose(th, exact, rtol=1e-10, atol=1e-10)


def test_threshold_default_close_to_exact():
    Cs = _sim(1, B=40)
    T = Cs.shape[1]
    exact = baselines.reference_log_likelihood(Cs, frame_len=T, **PARAMS)
    th = baselines.reference_log_likelihood_th(
        Cs, frame_len=6, threshold=0.2, max_nb_states=120, **PARAMS)
    # the reference's own default accuracy envelope: small per-track error
    assert np.max(np.abs(th - exact)) < 0.05


def test_threshold_off_matches_exact_substeps2():
    """nb_substeps=2 exercises the newest-first state-history layout
    (review fix: the one-hots were stored oldest-first for n >= 2)."""
    Cs = _sim(2, B=8, T=5)
    T = Cs.shape[1]
    kw = dict(PARAMS, nb_substeps=2)
    exact = baselines.reference_log_likelihood(Cs, frame_len=T, **kw)
    th = baselines.reference_log_likelihood_th(
        Cs, frame_len=T, threshold=1e-9, max_nb_states=10 ** 9, **kw)
    np.testing.assert_allclose(th, exact, rtol=1e-10, atol=1e-10)


def test_threshold_default_close_to_exact_substeps2():
    Cs = _sim(3, B=16, T=6)
    kw = dict(PARAMS, nb_substeps=2)
    exact = baselines.reference_log_likelihood(Cs, frame_len=6, **kw)
    th = baselines.reference_log_likelihood_th(
        Cs, frame_len=4, threshold=0.2, max_nb_states=240, **kw)
    # substeps=2 branches x4 per frame, so the same threshold prunes more
    # aggressively than at substeps=1 — the envelope is correspondingly wider
    assert np.max(np.abs(th - exact)) < 0.2
