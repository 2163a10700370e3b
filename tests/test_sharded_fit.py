"""End-to-end sharded fit on the 8-device virtual mesh."""
import numpy as np

import jax

from extrack_tpu import data as tdata, fit, params as xp, simulate


def test_sharded_fit_equals_single_device():
    assert len(jax.devices()) == 8
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=200, max_track_len=9, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=25)

    def run(sharded):
        spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                                  estimated_Ds=[0.005, 0.05])
        batches = tdata.from_dict_bucketed(tracks, max_buckets=2)
        return fit.fit(batches, spec, 0.02, 2, cell_dims=(0.5,), window=3,
                       sharded=sharded, max_iter=40)

    r1 = run(False)
    r8 = run(True)
    np.testing.assert_allclose(r8.logl, r1.logl, rtol=1e-8)
    for name in ("D1", "p01", "LocErr"):
        np.testing.assert_allclose(r8.params[name].value,
                                   r1.params[name].value, rtol=1e-5)
