"""Reference-named utility API: every module-level symbol a reference user
script can call must exist with compatible semantics (SURVEY.md §2; the
reference exposes its primitives at module level, extrack/__init__.py:1-10).
"""
import numpy as np
import pytest

from extrack_tpu import auto_fitting, refine, simulate, tracking
from extrack_tpu import params as xp


def test_symbol_presence():
    """Each reference public symbol resolves in the matching namespace."""
    import extrack_tpu.histograms as hist
    import extrack_tpu.io.exporters as exporters
    import extrack_tpu.io.readers as readers
    import extrack_tpu.visualization as viz
    table = {
        tracking: ["param_fitting", "predict_Bs", "generate_params",
                   "get_params", "Proba_Cs", "cum_Proba_Cs",
                   "extract_params", "get_all_Bs", "get_Ts_from_Bs",
                   "ds_froms_states", "log_integrale_dif",
                   "first_log_integrale_dif"],
        hist: ["len_hist", "ground_truth_hist"],
        refine: ["position_refinement", "get_pos_PDF", "get_all_estimates",
                 "get_global_sigs_mus", "get_best_estimates", "save_gifs",
                 "do_gifs_from_params", "full_extrack_2_matrix",
                 "prod_2GaussPDF", "prod_3GaussPDF", "gaussian",
                 "get_pos_PDF_fixedBs"],
        simulate: ["sim_FOV", "sim_noBias", "markovian_process",
                   "get_fractions_from_TrMat", "is_in_FOV"],
        readers: ["read_table", "read_trackmate_xml"],
        exporters: ["save_params", "extrack_2_matrix", "extrack_2_pandas",
                    "extrack_2_pandas2", "save_extrack_2_CSV",
                    "save_extrack_2_xml", "save_extrack_2_input_xml"],
        viz: ["visualize_states_durations", "visualize_tracks",
              "plot_tracks"],
        auto_fitting: ["fit_2states", "fit_3states"],
    }
    missing = [f"{m.__name__}.{n}" for m, names in table.items()
               for n in names if not hasattr(m, n)]
    assert not missing, missing


def test_extract_params_reference_convention():
    p = xp.generate_params(nb_states=2, estimated_LocErr=0.03, D_max=1.0)
    LocErr, ds, Fs, TrMat, pBL = tracking.extract_params(
        p.resolve(), dt=0.02, nb_states=2, nb_substeps=1)
    assert LocErr[0].shape == (1, 1, 1)
    np.testing.assert_allclose(LocErr[0][0, 0, 0], 0.03)
    vals = p.resolve()
    np.testing.assert_allclose(
        ds, np.sqrt(2 * np.array([vals["D0"], vals["D1"]]) * 0.02))
    np.testing.assert_allclose(TrMat.sum(1), 1.0, atol=1e-12)
    # Matrix_type=1 default: off-diagonals are 1 - exp(-p)
    np.testing.assert_allclose(TrMat[0, 1], 1 - np.exp(-vals["p01"]),
                               atol=1e-12)
    assert 0 < pBL < 1 and Fs.shape == (2,)


def test_extract_params_per_peak_slope_offset():
    p = xp.generate_params(nb_states=2, LocErr_type=4,
                           slope_offsets_estimates=(1.0, 0.01))
    vals = p.resolve()
    assert "slope_LocErr" in vals
    per_peak = [np.full((3, 7, 1), 0.02), np.full((2, 5, 1), 0.04)]
    LocErr, _, _, _, _ = tracking.extract_params(
        vals, dt=0.02, nb_states=2, nb_substeps=1, input_LocErr=per_peak)
    want = np.clip(0.02 * vals["slope_LocErr"] + vals["offset_LocErr"],
                   1e-6, np.inf)
    np.testing.assert_allclose(LocErr[0], want)


def test_get_all_Bs_and_Ts():
    bs = tracking.get_all_Bs(3, 2)
    assert bs.shape == (8, 3)
    assert set(map(tuple, bs)) == {(a, b, c) for a in (0, 1)
                                   for b in (0, 1) for c in (0, 1)}
    # LSB-first: sequence id 1 flips position 0
    np.testing.assert_array_equal(bs[1], [1, 0, 0])
    tr = np.array([[0.9, 0.1], [0.2, 0.8]])
    lt = tracking.get_Ts_from_Bs(bs[None], tr)
    np.testing.assert_allclose(
        lt[0], [np.log(tr[s0, s1] * tr[s1, s2]) for s0, s1, s2 in bs])


def test_gaussian_primitive_aliases():
    rng = np.random.default_rng(0)
    mu1, mu2, mu3 = rng.normal(size=(3, 4, 2))
    s1, s2, s3 = rng.uniform(0.5, 2.0, (3, 4, 1))
    sig, mu, lk = refine.prod_2GaussPDF(s1, s2, mu1, mu2)
    # product of two Gaussian PDFs integrates to exp(lk)
    v = 1 / (1 / s1 ** 2 + 1 / s2 ** 2)
    np.testing.assert_allclose(sig ** 2, v, rtol=1e-6)
    _, _, lk3 = refine.prod_3GaussPDF(s1, s2, s3, mu1, mu2, mu3)
    assert lk3.shape == lk.shape
    dens = refine.gaussian(mu1, s1, mu2)
    want = np.prod(np.exp(-(mu1 - mu2) ** 2 / (2 * s1 ** 2))
                   / np.sqrt(2 * np.pi * s1 ** 2), -1)
    np.testing.assert_allclose(dens, want, rtol=1e-12)


def test_log_integrale_dif_matches_quadrature_shape():
    rng = np.random.default_rng(1)
    Ci = rng.normal(size=(5, 3, 2))
    m0, s20 = tracking.first_log_integrale_dif(Ci, 4e-4, 0.01)
    m, s2, lc = tracking.log_integrale_dif(
        Ci + 0.05, 4e-4, 0.01, m0, np.asarray(s20) * np.ones_like(Ci))
    assert m.shape == Ci.shape and lc.shape == (5, 3)
    assert np.isfinite(np.asarray(lc)).all()


def test_ds_froms_states():
    ds = np.array([0.0, 0.1])
    states = np.array([[[0, 1, 1]], [[1, 1, 1]]])
    d2 = tracking.ds_froms_states(ds, states)
    np.testing.assert_allclose(
        d2[..., 0], [[(0.005 + 0.01) / 2], [0.01]])


def test_get_pos_PDF_fixedBs():
    """Known-state refinement: reference signature, (T, D) return, and the
    no-motion sanity check (D=0 everywhere pulls mu toward the track mean)."""
    rng = np.random.default_rng(5)
    T = 6
    Cs = rng.normal(0, 0.05, (1, T, 2)).cumsum(1)
    ds = np.array([np.sqrt(2 * 0.0 * 0.02), np.sqrt(2 * 0.1 * 0.02)])
    Bs = np.zeros((1, 1, T), int)
    mu, sig = refine.get_pos_PDF_fixedBs(
        Cs, 0.02, ds, np.array([0.5, 0.5]),
        np.array([[0.9, 0.1], [0.1, 0.9]]), Bs)
    assert mu.shape == (T, 2) and sig.shape == (T, 2)
    # state 0 is immobile: every refined position shrinks toward the mean
    spread = np.linalg.norm(mu - mu.mean(0), axis=-1).mean()
    raw = np.linalg.norm(Cs[0] - Cs[0].mean(0), axis=-1).mean()
    assert spread < raw


def test_fit_2states_smoke():
    tracks, _, _ = simulate.sim_FOV(
        nb_tracks=150, max_track_len=9, min_track_len=4, LocErr=0.02,
        Ds=[0.0, 0.1], dt=0.02, seed=3)
    res, preds = auto_fitting.fit_2states(
        tracks, 0.02, steady_state=False,
        estimated_vals={"LocErr": 0.025, "D0": 1e-6, "D1": 0.05,
                        "F0": 0.45, "p01": 0.05, "p10": 0.05, "pBL": 0.1},
        vary_params={"pBL": False})
    assert np.isfinite(res.logl)
    assert not res.params["pBL"].vary
    for key, v in tracks.items():
        np.testing.assert_allclose(preds[key].sum(-1), 1.0, atol=1e-5)


def test_proba_cs_per_dimension_locerr():
    """A (D,) LocErr lands on the SPATIAL axis (regression: np.atleast_3d
    mapped it to the time axis); equal per-dim errors match the scalar."""
    rng = np.random.default_rng(9)
    Cs = rng.normal(0, 0.2, (4, 6, 2)).cumsum(1)
    kw = dict(ds=np.array([0.05, 0.3]), Fs=np.array([0.5, 0.5]),
              TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), pBL=0.05, isBL=1,
              cell_dims=(1.0,))
    aniso = tracking.Proba_Cs(Cs, np.array([0.02, 0.03]), **kw)
    assert np.asarray(aniso).shape == (4,)          # T != D used to raise
    iso = tracking.Proba_Cs(Cs, np.array([0.025, 0.025]), **kw)
    scalar = tracking.Proba_Cs(Cs, 0.025, **kw)
    np.testing.assert_allclose(np.asarray(iso), np.asarray(scalar),
                               atol=1e-12)


def test_cum_proba_cs_batch_cache():
    """Optimizer loops reuse the uploaded batch; mutated data busts it."""
    rng = np.random.default_rng(10)
    tracks = {"5": rng.normal(0, 0.1, (7, 5, 2)).cumsum(1),
              "8": rng.normal(0, 0.1, (3, 8, 2)).cumsum(1)}
    p = xp.generate_params(nb_states=2, D_max=1.0)
    tracking._batch_cache.clear()
    out = tracking.cum_Proba_Cs(p, tracks, 0.02, (1.0,), None, 2, 1, 5,
                                verbose=0)
    out2 = tracking.cum_Proba_Cs(p, tracks, 0.02, (1.0,), None, 2, 1, 5,
                                 verbose=0)
    assert out == out2 and len(tracking._batch_cache) == 1
    tracks["5"] = tracks["5"] * 1.3        # non-rigid: changes displacements
    out3 = tracking.cum_Proba_Cs(p, tracks, 0.02, (1.0,), None, 2, 1, 5,
                                 verbose=0)
    assert out3 != out and len(tracking._batch_cache) == 2


def test_markovian_process_under_normalized_fractions():
    """searchsorted can return nb_states when the initial fractions sum to
    < 1; the remainder goes to the last state (reference behavior) instead
    of indexing out of bounds."""
    tr = np.array([[0.8, 0.1, 0.1], [0.1, 0.8, 0.1], [0.05, 0.05, 0.9]])
    s = simulate.markovian_process(tr, [0.5, 0.3, 0.1], 2000, 5, seed=0)
    assert s.shape == (2000, 5) and s.min() >= 0 and s.max() <= 2
    counts = np.bincount(s[:, 0], minlength=3) / 2000
    # last state absorbs the missing 0.1 of mass
    assert abs(counts[2] - 0.2) < 0.04
