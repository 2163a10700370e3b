"""End-to-end device-resident pipeline (read -> fit -> predict -> hist ->
refine -> export) against the individual dict-API drivers."""
import os

import numpy as np

from extrack_tpu import data as tdata, histograms, pipeline, predict, refine
from extrack_tpu import params as tparams
from extrack_tpu import simulate


def _dataset():
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=60, max_track_len=9, min_track_len=4, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, .1], [.15, .85]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=3)
    return tracks


def test_analyze_matches_individual_drivers(tmp_path):
    tracks = _dataset()
    csv = str(tmp_path / "out.csv")
    res = pipeline.analyze(tracks, dt=0.02, nb_states=2,
                           cell_dims=(0.5, None, None), window=5,
                           hist_window=5, refine_frame_len=5,
                           export_csv=csv, verbose=0)
    assert res.fit.success or res.fit.n_evals > 0
    values = res.fit.params.resolve()

    # posteriors match the dict driver at the fitted parameters
    preds_ref = predict.predict_Bs(tracks, 0.02, values, nb_states=2,
                                   cell_dims=(0.5, None, None), frame_len=5)
    assert sorted(res.preds) == sorted(preds_ref)
    for k in preds_ref:
        np.testing.assert_allclose(res.preds[k], preds_ref[k],
                                   rtol=1e-8, atol=1e-10)

    # histogram matches len_hist
    h_ref = histograms.len_hist(tracks, values, 0.02, nb_states=2,
                                cell_dims=(0.5, None, None), window=5)
    assert res.hist is not None
    np.testing.assert_allclose(res.hist[:h_ref.shape[0]], h_ref,
                               rtol=1e-8, atol=1e-10)
    assert abs(res.hist.sum() - h_ref.sum()) < 1e-6

    # refinement matches position_refinement
    from extrack_tpu.core import tables as ttables
    Ds, _, rates, loc_err, _ = tparams.extract_arrays(values, 2)
    tr = np.asarray(ttables.transition_matrix(rates))
    ds = np.sqrt(2.0 * np.asarray(Ds) * 0.02)
    mus_ref, sigs_ref = refine.position_refinement(
        tracks, float(np.asarray(loc_err).ravel()[0]), ds, None, tr,
        frame_len=5)
    assert sorted(res.mus) == sorted(mus_ref)
    for k in mus_ref:
        np.testing.assert_allclose(res.mus[k], mus_ref[k],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(res.sigmas[k], sigs_ref[k],
                                   rtol=1e-8, atol=1e-10)

    # export landed on disk with one row per localization
    assert os.path.exists(csv)
    n_rows = sum(1 for _ in open(csv)) - 1
    n_locs = sum(int(k) * len(v) for k, v in tracks.items())
    assert n_rows == n_locs


def test_analyze_csv_path_entry():
    path = "/root/reference/Tutorials/example_tracks.csv"
    if not os.path.exists(path):
        return
    res = pipeline.analyze(path, dt=0.02, nb_states=2, window=5,
                           lengths=list(range(5, 20)),
                           do_hist=False, do_refine=False,
                           fit_kwargs={"max_iter": 3})
    assert res.preds is not None
    assert set(res.preds) == set(res.tracks)
