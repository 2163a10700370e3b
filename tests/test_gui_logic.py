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


def test_parameter_editor_rows_roundtrip():
    from extrack_tpu import params as xp
    spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.001, 0.05])
    rows = gui.spec_rows(spec)
    names = [r[0] for r in rows]
    assert "LocErr" in names and "D0" in names and "pBL" in names
    # edit: fix LocErr at 0.03 (vary off), widen D bound
    edited = []
    for name, value, mn, mx, vary, expr in rows:
        if name == "LocErr":
            edited.append((name, 0.03, mn, mx, False))
        elif name == "D0":
            edited.append((name, value, mn, 2.0, vary))
        else:
            edited.append((name, value, mn, mx, vary))
    out = gui.apply_rows(spec, edited)
    assert out["LocErr"].value == 0.03 and out["LocErr"].vary is False
    assert out["D0"].max == 2.0
    # derived params keep their expressions
    for name, p in out.items():
        if p.expr is not None:
            assert spec[name].expr == p.expr
    # original untouched
    assert spec["LocErr"].vary is True


def test_session_uses_edited_spec(csv_path, tmp_path):
    from extrack_tpu import params as xp
    s = gui.Session(path=csv_path, dt=0.02, min_len=4, max_len=9,
                    nb_states=2, cell_dims=(0.5,), frame_len_fit=3,
                    frame_len_label=4, nb_iters=1, output_dir=str(tmp_path))
    s.load()
    spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.001, 0.05])
    rows = [(n, v, mn, mx, False if n == "LocErr" else vy)
            for n, v, mn, mx, vy, e in gui.spec_rows(spec)]
    s.params_spec = gui.apply_rows(spec, rows)
    res = gui.run_fitting(s, progress=lambda *_: None)
    # LocErr was fixed by the editor: the fit must not move it
    assert res.params["LocErr"].value == pytest.approx(
        s.params_spec["LocErr"].value)
    assert res.params["D1"].value == pytest.approx(0.08, abs=0.03)
