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


def test_analysis_option_schemas():
    # every analysis has a dedicated options window schema
    assert set(gui.ANALYSIS_OPTIONS) == set(gui._ANALYSES)
    o = gui.default_options("Model Fitting")
    assert o["nb_iters"] == 3 and o["first_method"] == "L-BFGS-B"
    # string fields parse to the declared types, incl. bool spellings
    parsed = gui.parse_options("Model Fitting", {
        "nb_iters": "2", "frame_len": "5", "nb_substeps": "1",
        "steady_state": "true", "first_method": "powell",
        "compute_errors": "0"})
    assert parsed == {"nb_iters": 2, "frame_len": 5, "nb_substeps": 1,
                      "steady_state": True, "first_method": "powell",
                      "compute_errors": False}
    parsed = gui.parse_options("State Lifetime Histogram",
                               {"long_tracks": "on"})
    assert parsed["long_tracks"] is True and parsed["frame_len"] == 8


def test_runners_honor_options(csv_path, tmp_path):
    s = gui.Session(path=csv_path, dt=0.02, min_len=4, max_len=9,
                    nb_states=2, cell_dims=(0.5,), frame_len_fit=3,
                    frame_len_label=4, nb_iters=1, output_dir=str(tmp_path))
    s.load()
    msgs = []
    res = gui.run_fitting(s, progress=msgs.append,
                          options={"nb_iters": 2, "frame_len": 3,
                                   "compute_errors": False})
    assert res.success and res.std_errors is None
    assert sum("iteration" in m for m in msgs) == 2
    gui.run_lifetime(s, progress=msgs.append,
                     options={"frame_len": 5, "long_tracks": True,
                              "min_len_hist": 6})
    assert os.path.exists(tmp_path / "extrack_durations.csv")


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


def test_fit_updates_spec_and_seeded_options(csv_path, tmp_path):
    """After a fit, spec() must return the FITTED optimum even when a
    pre-fit editor spec exists (regression: params_spec kept pre-fit editor
    values and later analyses silently ignored the fit).  Also: the main
    window's frame_len/nb_iters fields seed the analysis options."""
    from extrack_tpu import params as xp
    s = gui.Session(path=csv_path, dt=0.02, min_len=4, max_len=9,
                    nb_states=2, cell_dims=(0.5,), frame_len_fit=3,
                    frame_len_label=4, nb_iters=2, output_dir=str(tmp_path))
    s.load()
    s.params_spec = xp.generate_params(nb_states=2, LocErr_type=1,
                                       D_max=3.0)     # "edited" pre-fit
    pre_d1 = s.params_spec["D1"].value
    res = gui.run_fitting(s, progress=lambda *_: None,
                          options={"nb_iters": 1, "compute_errors": False})
    assert s.spec()["D1"].value == pytest.approx(res.params["D1"].value)
    assert s.spec()["D1"].value != pytest.approx(pre_d1)

    o = gui.seeded_options("Model Fitting", s)
    assert o["nb_iters"] == 2 and o["frame_len"] == 3
    assert gui.seeded_options("State Labeling", s)["frame_len"] == 4


def test_load_clears_stale_input_loc_err(csv_path):
    s = gui.Session(path=csv_path, dt=0.02, min_len=4, max_len=9)
    s.input_loc_err = {"9": np.full((1, 9), 0.05)}   # from a previous load
    s.load()
    assert s.input_loc_err is None


def test_params_json_warm_starts_fit(csv_path, tmp_path):
    """A loaded params JSON (session.params_values, no editor spec) must
    seed run_fitting's starting point (regression: it was ignored)."""
    s = gui.Session(path=csv_path, dt=0.02, min_len=4, max_len=9,
                    nb_states=2, cell_dims=(0.5,),
                    params_values={"D1": 0.123, "LocErr": 0.033},
                    output_dir=str(tmp_path))
    s.load()
    captured = {}
    import extrack_tpu.fit as tfit
    orig = tfit.param_fitting

    def spy(tracks, dt, params=None, **kw):
        vals = params.resolve()            # D1 is expr-tied (cumulative)
        captured["D1"] = vals["D1"]
        captured["LocErr"] = vals["LocErr"]
        return orig(tracks, dt, params=params, **kw)

    try:
        tfit.param_fitting = spy
        gui.run_fitting(s, progress=lambda *_: None,
                        options={"nb_iters": 1, "compute_errors": False})
    finally:
        tfit.param_fitting = orig
    assert captured["D1"] == pytest.approx(0.123)
    assert captured["LocErr"] == pytest.approx(0.033)
