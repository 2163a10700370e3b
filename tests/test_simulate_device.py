"""On-device simulator (sim_fov_batch) vs the host oracle (sim_fov).

The host path was verified against the reference semantics in round 1
(simulate_tracks.py:123-244); the device path must match it statistically —
same track-count yield, length distribution, state-conditional displacement
variance, and FOV geometry.
"""
import numpy as np

import jax

from extrack_tpu import simulate

KW = dict(nb_tracks=12000, max_track_len=12, min_track_len=3, LocErr=0.02,
          Ds=(0.0, 0.08), TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]),
          dt=0.02, pBL=0.05, cell_dims=(0.5, None, None))


def _device(seed=7, **over):
    kw = {**KW, **over}
    batches, states = simulate.sim_fov_batch(seed=seed, **kw)
    lens = np.concatenate([np.asarray(b.lengths) for b in batches])
    return batches, states, lens


def test_yield_and_length_distribution_match_host():
    _, _, lens = _device()
    tracks, _, _ = simulate.sim_fov(seed=8, **KW)
    n_host = sum(len(v) for v in tracks.values())
    mean_host = np.average([int(k) for k in tracks],
                           weights=[len(v) for v in tracks.values()])
    assert abs(len(lens) - n_host) / n_host < 0.05
    assert abs(lens.mean() - mean_host) / mean_host < 0.03
    # per-length histogram within 15% on the populous lengths
    host_counts = {int(k): len(v) for k, v in tracks.items()}
    for L, c_host in host_counts.items():
        if c_host < 400:
            continue
        c_dev = int((lens == L).sum())
        assert abs(c_dev - c_host) / c_host < 0.15, (L, c_dev, c_host)


def test_batch_invariants():
    batches, states, lens = _device()
    assert (lens >= KW["min_track_len"]).all()
    data_max = lens.max()
    for b, s in zip(batches, states):
        le = np.asarray(b.lengths)
        t = np.arange(b.max_len)[None, :]
        valid = t < le[:, None]
        # padding is zeroed, bleach flag matches the length convention
        assert np.all(np.asarray(b.positions)[~valid] == 0.0)
        np.testing.assert_array_equal(
            np.asarray(b.is_bleached), (le < data_max).astype(float))
        # bounded x-dim stays inside the FOV up to localization noise
        x = np.asarray(b.positions)[..., 0]
        assert x[valid].min() > -0.2 and x[valid].max() < 0.7
        assert np.asarray(s).shape == (b.batch_size, b.max_len)


def _state_step_var(tracks_by_len, states_by_len):
    """Mean squared per-dim displacement for steps whose endpoints share a
    state.  Includes the simulator's real selection effects (mid-frame state
    excursions, FOV survival bias), so it is comparable device-vs-host."""
    d2 = {0: [], 1: []}
    for pos, st in zip(tracks_by_len, states_by_len):
        dx = pos[:, 1:] - pos[:, :-1]
        for k in (0, 1):
            m = (st[:, :-1] == k) & (st[:, 1:] == k)
            d2[k].append((dx[m] ** 2).ravel())
    return {k: np.concatenate(v).mean() for k, v in d2.items()}


def test_state_conditional_displacement_variance_matches_host():
    kw = dict(KW, nb_tracks=20000, pBL=0.02, LocErr=0.005)
    batches, states, _ = _device(**kw)
    # replace padded frames' states by -1 so no step touching padding
    # matches either state
    dev = _state_step_var(
        [np.asarray(b.positions) for b in batches],
        [np.where(np.arange(s.shape[1])[None, :]
                  < np.asarray(b.lengths)[:, None], np.asarray(s), -1)
         for b, s in zip(batches, states)])
    tracks, stt, _ = simulate.sim_fov(seed=5, **kw)
    host = _state_step_var([np.asarray(tracks[k]) for k in tracks],
                           [np.asarray(stt[k]) for k in tracks])
    for k in (0, 1):
        assert abs(dev[k] - host[k]) / host[k] < 0.05, (k, dev[k], host[k])


def test_per_peak_sigmas_match_host():
    batches, _, _ = _device(LocErr_std=0.007)
    vals = []
    for b in batches:
        sig = np.asarray(b.loc_err)
        valid = (np.arange(b.max_len)[None, :, None]
                 < np.asarray(b.lengths)[:, None, None])
        vals.append(sig[np.broadcast_to(valid, sig.shape)])
    v = np.concatenate(vals)
    tracks, _, hs = simulate.sim_fov(seed=8, LocErr_std=0.007, **KW)
    hv = np.concatenate([np.asarray(x).ravel() for x in hs.values()])
    # chi-square(k=2/std^2) scaled to mean LocErr: same mean AND dispersion
    assert abs(v.mean() - hv.mean()) / hv.mean() < 0.01
    assert abs(v.std() - hv.std()) / hv.std() < 0.10
    assert v.std() > 0  # actually dispersed, not a constant


def test_fit_recovers_parameters_from_device_sim():
    from extrack_tpu import fit, params as xp
    batches, _, _ = _device(nb_tracks=4000, seed=3)
    spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.003, 0.05])
    res = fit.fit(batches, spec, KW["dt"], 2, cell_dims=(0.5,), window=4,
                  max_iter=60)
    assert res.success or res.n_evals >= 30
    assert abs(res.params["D1"].value - 0.08) < 0.015
    assert abs(res.params["LocErr"].value - 0.02) < 0.005
