"""GUI session logic (display-free): the four analyses over a Session."""
import json
import os

import numpy as np
import pytest

from extrack_tpu import gui, simulate
from extrack_tpu.io import exporters


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("gui")
    tracks, states, _ = simulate.sim_fov(
        nb_tracks=250, max_track_len=9, min_track_len=4, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=13)
    preds = {k: np.eye(2)[states[k]] for k in states}
    p = str(d / "tracks.csv")
    exporters.save_extrack_2_CSV(p, tracks, preds, 0.02)
    return p


def test_session_all_analyses(csv_path, tmp_path):
    s = gui.Session(path=csv_path, dt=0.02, min_len=4, max_len=9,
                    nb_states=2, cell_dims=(0.5,), frame_len_fit=3,
                    frame_len_label=4, nb_iters=1,
                    output_dir=str(tmp_path))
    n = s.load()
    assert n > 100
    msgs = []
    res = gui.run_fitting(s, progress=msgs.append)
    assert res.success and s.params_values is not None
    assert os.path.exists(tmp_path / "extrack_fitted_params.json")
    assert abs(s.params_values["D1"] - 0.08) / 0.08 < 0.4

    gui.run_predictions(s, progress=msgs.append)
    assert os.path.exists(tmp_path / "extrack_predictions.csv")
    gui.run_lifetime(s, progress=msgs.append)
    assert os.path.exists(tmp_path / "extrack_durations.png")
    gui.run_refinement(s, progress=msgs.append)
    assert os.path.exists(tmp_path / "extrack_refined.csv")
    assert len(msgs) >= 5

    # params JSON round-trips into a new session (pre-fitted workflow)
    payload = json.load(open(tmp_path / "extrack_fitted_params.json"))
    s2 = gui.Session(path=csv_path, dt=0.02, min_len=4, max_len=9,
                     nb_states=2, cell_dims=(0.5,),
                     params_values=payload["values"],
                     output_dir=str(tmp_path))
    s2.load()
    spec = s2.spec()
    assert spec["D1"].value == pytest.approx(s.params_values["D1"])
