"""Chunked prediction / histogram drivers must equal unchunked results."""
import numpy as np

import jax.numpy as jnp

from extrack_tpu import data as tdata, histograms, params as xp, predict, \
    simulate


def _setup():
    tracks, _, sigs = simulate.sim_fov(
        nb_tracks=400, max_track_len=9, min_track_len=3, LocErr=0.02,
        LocErr_std=0.3, Ds=(0.0, 0.08),
        TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), dt=0.02, pBL=0.05,
        cell_dims=(0.5, None, None), seed=23)
    spec = xp.generate_params(nb_states=2, LocErr_type=4, D_max=1.0,
                              estimated_Ds=[0.0, 0.08],
                              slope_offsets_estimates=[1.0, 0.001])
    return tracks, sigs, spec


def test_predict_chunked_equals_unchunked():
    tracks, sigs, spec = _setup()
    batch = tdata.from_dict(tracks, input_loc_err=sigs)
    l1, p1 = predict.predict_batch(batch, spec, 0.02, 2, cell_dims=(0.5,),
                                   window=4, input_loc_err=True,
                                   chunk_size=1 << 20)
    l2, p2 = predict.predict_batch(batch, spec, 0.02, 2, cell_dims=(0.5,),
                                   window=4, input_loc_err=True,
                                   chunk_size=128)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-10)


def test_len_hist_additive_over_subsets():
    tracks, sigs, spec = _setup()
    h_big = histograms.len_hist(tracks, spec, 0.02, cell_dims=(0.5,),
                                nb_states=2, max_nb_states=128,
                                input_LocErr=sigs)
    keys = sorted(tracks, key=int)
    half = len(keys) // 2
    h_a = histograms.len_hist({k: tracks[k] for k in keys[:half]}, spec,
                              0.02, cell_dims=(0.5,), nb_states=2,
                              max_nb_states=128,
                              input_LocErr={k: sigs[k] for k in keys[:half]})
    h_b = histograms.len_hist({k: tracks[k] for k in keys[half:]}, spec,
                              0.02, cell_dims=(0.5,), nb_states=2,
                              max_nb_states=128,
                              input_LocErr={k: sigs[k] for k in keys[half:]})
    # additivity over track subsets (isBL conventions differ per subset's
    # max length, so compare only where both subsets keep isBL=1 semantics)
    assert h_big.shape[1] == 2
    total = h_a[:h_big.shape[0]].sum() + h_b[:h_big.shape[0]].sum()
    assert abs(total - h_big.sum()) / h_big.sum() < 0.05


def test_batch_native_postfit_apis():
    """hist_batch / refine_batch (TrackBatch in, arrays out) match the
    dict drivers."""
    import numpy as np
    from extrack_tpu import data as tdata, histograms, refine
    from extrack_tpu import params as tparams
    rng = np.random.default_rng(2)
    tracks = {"5": np.cumsum(rng.normal(0, 0.05, (6, 5, 2)), axis=1),
              "7": np.cumsum(rng.normal(0, 0.05, (5, 7, 2)), axis=1)}
    p = tparams.generate_params(nb_states=2, D_max=1.0)
    batch = tdata.from_dict(tracks)
    h_dict = histograms.len_hist(tracks, p, 0.02, nb_states=2, window=5)
    h_batch = histograms.hist_batch(batch, p, 0.02, nb_states=2, window=5)
    np.testing.assert_allclose(h_batch, h_dict, rtol=1e-12)
    ds = np.array([0.02, 0.1])
    tr = np.array([[0.9, 0.1], [0.2, 0.8]])
    mus_d, sigs_d = refine.position_refinement(
        tracks, 0.02, ds, None, tr, frame_len=5)
    mu_b, sig_b, B0 = refine.refine_batch(batch, 0.02, ds, tr, frame_len=5)
    assert B0 == batch.batch_size
    np.testing.assert_allclose(mu_b[:6, :5], mus_d["5"], rtol=1e-12)
    np.testing.assert_allclose(sig_b[6:, :7, 0], sigs_d["7"], rtol=1e-12)
