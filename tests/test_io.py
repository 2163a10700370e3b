"""Readers / exporters round-trip tests against the reference fixtures."""
import os
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
import pytest

from extrack_tpu import params as xp
from extrack_tpu.io import exporters, readers

FIXTURES = "/root/reference/Tutorials"


@pytest.mark.skipif(not os.path.exists(f"{FIXTURES}/example_tracks.csv"),
                    reason="reference fixtures unavailable")
def test_read_table_example_fixture():
    tracks, frames, opt = readers.read_table(
        f"{FIXTURES}/example_tracks.csv",
        lengths=np.arange(5, 12),
        colnames=["POSITION_X", "POSITION_Y", "FRAME", "TRACK_ID"],
        opt_colnames=["QUALITY"])
    assert tracks
    total = sum(v.shape[0] for v in tracks.values())
    assert total > 10
    for k, arr in tracks.items():
        assert arr.ndim == 3 and arr.shape[1] == int(k) and arr.shape[2] == 2
        assert frames[k].shape == arr.shape[:2]
        assert opt["QUALITY"][k].shape == arr.shape[:2]
        # frames strictly increasing within each track
        assert np.all(np.diff(frames[k], axis=1) > 0)


@pytest.mark.skipif(not os.path.exists(f"{FIXTURES}/example_tracks.xml"),
                    reason="reference fixtures unavailable")
def test_read_trackmate_xml_fixture():
    tracks, frames, _ = readers.read_trackmate_xml(
        f"{FIXTURES}/example_tracks.xml", lengths=np.arange(5, 12),
        dist_th=np.inf)
    assert tracks
    for k, arr in tracks.items():
        assert arr.shape[1] == int(k) and arr.shape[2] == 2


def test_read_table_filters(tmp_path):
    rows = []
    # track 0: fine; track 1: giant jump; track 2: no displacement
    for tid, jump in [(0, 0.01), (1, 5.0), (2, 0.0)]:
        x = 0.0
        for f in range(6):
            rows.append({"POSITION_X": x, "POSITION_Y": 0.2, "FRAME": f,
                         "TRACK_ID": tid})
            x += jump
    p = tmp_path / "t.csv"
    pd.DataFrame(rows).to_csv(p, index=False)
    tracks, _, _ = readers.read_table(str(p), lengths=[6], dist_th=0.5)
    assert tracks["6"].shape[0] == 1          # only the well-behaved track
    tracks2, _, _ = readers.read_table(str(p), lengths=[6], dist_th=0.5,
                                       remove_no_disp=False)
    assert tracks2["6"].shape[0] == 2


def test_length_bucketing_and_truncation(tmp_path):
    rows = []
    for tid, n in [(0, 4), (1, 7), (2, 15)]:
        for f in range(n):
            rows.append({"POSITION_X": f * 0.01 + tid, "POSITION_Y": 0.0,
                         "FRAME": f, "TRACK_ID": tid})
    p = tmp_path / "t.csv"
    pd.DataFrame(rows).to_csv(p, index=False)
    tracks, _, _ = readers.read_table(str(p), lengths=[5, 6, 10])
    assert "10" in tracks and tracks["10"].shape[0] == 1   # truncated 15
    assert "6" in tracks and tracks["6"].shape[0] == 1     # 7 -> bucket 6
    assert sum(v.shape[0] for v in tracks.values()) == 2   # 4 dropped


def test_exporters_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tracks = {"5": rng.normal(size=(3, 5, 2)), "7": rng.normal(size=(2, 7, 2))}
    preds = {k: np.abs(rng.random((v.shape[0], v.shape[1], 2)))
             for k, v in tracks.items()}
    for k in preds:
        preds[k] /= preds[k].sum(-1, keepdims=True)
    spec = xp.generate_params(nb_states=2)

    df = exporters.extrack_2_pandas(tracks, preds)
    assert len(df) == 3 * 5 + 2 * 7
    assert {"POSITION_X", "POSITION_Y", "FRAME", "TRACK_ID", "pred_0",
            "pred_1"} <= set(df.columns)

    csv_path = tmp_path / "out.csv"
    exporters.save_extrack_2_CSV(str(csv_path), tracks, preds, dt=0.02)
    back = pd.read_csv(csv_path)
    assert len(back) == len(df)
    assert back["PRED_1"].between(0, 1).all()

    xml_path = tmp_path / "out.xml"
    exporters.save_extrack_2_xml(tracks, preds, spec, str(xml_path), 0.02)
    root = ET.parse(xml_path).getroot()
    assert root.tag == "Tracks" and int(root.get("nTracks")) == 5
    # our own trackmate reader must be able to re-read the export
    tracks2, _, opt2 = readers.read_trackmate_xml(
        str(xml_path), lengths=[5, 7], dist_th=np.inf,
        remove_no_disp=False, opt_metrics_names=["pred_1"])
    assert tracks2["5"].shape == (3, 5, 2)
    got = np.sort(opt2["pred_1"]["5"].ravel())
    np.testing.assert_allclose(got, np.sort(preds["5"][..., 1].ravel()),
                               atol=1e-12)

    tm_path = tmp_path / "tm.xml"
    exporters.save_extrack_2_input_xml(tracks, preds, spec, str(tm_path),
                                       0.02)
    tm = ET.parse(tm_path).getroot()
    assert tm.tag == "TrackMate"
    spots = tm.find("Model/AllSpots")
    assert int(spots.get("nspots")) == 3 * 5 + 2 * 7
    assert len(tm.findall("Model/AllTracks/Track")) == 5

    exporters.save_params(spec, str(tmp_path), fmt="json")
    loaded = exporters.load_params(str(tmp_path / "params.json"))
    assert loaded["D0"].value == pytest.approx(spec["D0"].value)


def test_visualization_smoke(tmp_path):
    rng = np.random.default_rng(1)
    tracks = {"12": rng.normal(0, 0.05, (6, 12, 2)).cumsum(1)}
    preds = {"12": np.abs(rng.random((6, 12, 2)))}
    preds["12"] /= preds["12"].sum(-1, keepdims=True)
    from extrack_tpu import visualization as viz
    df = exporters.extrack_2_pandas(tracks, preds)
    viz.visualize_tracks(df, track_length_range=[2, np.inf])
    fig = viz.plot_tracks(df, nb_subplots=(2, 3))
    fig.savefig(tmp_path / "gallery.png")
    assert (tmp_path / "gallery.png").stat().st_size > 0


def test_extrack_2_matrix_reference_column_order():
    """[x, y, track_id, frame, preds] — the reference concatenates
    positions, IDs, frames, preds (exporters.py:28-53); regression: the
    DataFrame's FRAME-before-TRACK_ID layout leaked through."""
    tracks = {"3": np.arange(12, dtype=float).reshape(2, 3, 2)}
    preds = {"3": np.dstack([np.full((2, 3), 0.25), np.full((2, 3), 0.75)])}
    frames = {"3": np.array([[5, 6, 7], [8, 9, 10]], dtype=float)}
    m = exporters.extrack_2_matrix(tracks, preds, 0.02, all_frames=frames)
    assert m.shape == (6, 6)
    np.testing.assert_allclose(m[:, 0], [0, 2, 4, 6, 8, 10])    # x
    np.testing.assert_allclose(m[:, 2], [0, 0, 0, 1, 1, 1])     # track_id
    np.testing.assert_allclose(m[:, 3], [5, 6, 7, 8, 9, 10])    # frame
    np.testing.assert_allclose(m[:, 4], 0.25)                   # pred_0


def test_read_table_composite_id_multi_file(tmp_path):
    """Composite (multi-column) track IDs over SEVERAL files (regression:
    the second file crashed because id_col was reassigned in the loop)."""
    import pandas as pd
    rng = np.random.default_rng(8)
    paths = []
    for f in range(2):
        rows = []
        for tid in range(3):
            for j in range(6):
                rows.append({"POSITION_X": rng.normal(), "POSITION_Y":
                             rng.normal(), "FRAME": j, "TRACK_ID": tid,
                             "FOV": f})
        p = str(tmp_path / f"f{f}.csv")
        pd.DataFrame(rows).to_csv(p, index=False)
        paths.append(p)
    tracks, frames, _ = readers.read_table(
        paths, lengths=(6,), remove_no_disp=False,
        colnames=("POSITION_X", "POSITION_Y", "FRAME",
                  ["TRACK_ID", "FOV"]))
    assert tracks["6"].shape == (6, 6, 2)      # 3 tracks x 2 files


def test_read_table_string_ids_engine_auto(tmp_path):
    """Non-numeric track IDs must flow through the pandas path under
    engine='auto' (regression: the native parser turned every string ID
    into an isolated peak — silent total data loss)."""
    import pandas as pd
    rng = np.random.default_rng(9)
    rows = []
    for tid in range(4):
        for j in range(7):
            rows.append({"POSITION_X": rng.normal(),
                         "POSITION_Y": rng.normal(),
                         "FRAME": j, "TRACK_ID": f"Track_{tid:04d}"})
    p = str(tmp_path / "str_ids.csv")
    pd.DataFrame(rows).to_csv(p, index=False)
    tracks, _, _ = readers.read_table(p, lengths=(7,),
                                      remove_no_disp=False, engine="auto")
    assert tracks["7"].shape == (4, 7, 2)


def test_visualize_tracks_length_range_upper_bound():
    """track_length_range's upper bound filters long tracks (the reference's
    own comparison never applied it — DEVIATIONS.md 11)."""
    import pandas as pd
    from extrack_tpu import visualization as viz
    rows = []
    for tid, n in enumerate((4, 10)):
        for j in range(n):
            rows.append({"TRACK_ID": tid, "POSITION_X": float(j),
                         "POSITION_Y": 0.0, "pred_0": 0.5, "pred_1": 0.5})
    df = pd.DataFrame(rows)
    fig = viz.visualize_tracks(df, track_length_range=(3, 5))
    pts = sum(len(c.get_offsets()) for ax in fig.axes
              for c in ax.collections)
    assert pts == 4                      # only the 4-point track plotted
    import matplotlib.pyplot as plt
    plt.close("all")


def test_cli_hist_forwards_window(monkeypatch, tmp_path):
    """The histogram subcommand forwards --window to len_hist (regression:
    it was silently ignored) and plots the histogram it just computed."""
    import argparse
    from extrack_tpu import cli, histograms
    seen = {}

    def fake_len_hist(tracks, spec, dt, **kw):
        seen.update(kw)
        return np.ones((5, 2))

    def fake_load(args):
        return ({"6": np.zeros((1, 6, 2))}, {"6": np.arange(6)[None]}, None)

    monkeypatch.setattr(histograms, "len_hist", fake_len_hist)
    monkeypatch.setattr(cli, "_load", fake_load)
    seen_plot = {}
    from extrack_tpu import visualization as viz
    monkeypatch.setattr(viz, "visualize_states_durations",
                        lambda *a, **kw: seen_plot.update(kw))
    args = argparse.Namespace(
        path="x.csv", dt=0.02, min_len=5, max_len=40, dist_th=np.inf,
        x_col="POSITION_X", y_col="POSITION_Y", frame_col="FRAME",
        id_col="TRACK_ID", quality_column=None, states=2, cell_dims=[1.0],
        window=11, params=None, sharded=False,
        output=str(tmp_path / "h.csv"), plot=True, verbose=0)
    cli.cmd_hist(args)
    assert seen["window"] == 11
    assert "hists" in seen_plot and seen_plot["hists"].shape == (5, 2)


def test_read_table_quoted_fields_fall_back(tmp_path):
    """RFC-4180 quoted cells can embed the separator and shift columns in a
    naive splitter; the native parser NaNs such rows so engine='auto' falls
    back to pandas and returns the same tracks."""
    p = str(tmp_path / "quoted.csv")
    with open(p, "w") as fh:
        fh.write("NOTE,POSITION_X,POSITION_Y,FRAME,TRACK_ID\n")
        for tid in range(3):
            for j in range(6):
                fh.write(f'"a, b",{tid + j * 0.1},{j * 1.0},{j},{tid}\n')
    t1, _, _ = readers.read_table(p, lengths=(6,), remove_no_disp=False,
                                  engine="auto")
    t2, _, _ = readers.read_table(p, lengths=(6,), remove_no_disp=False,
                                  engine="pandas")
    assert t1["6"].shape == (3, 6, 2)
    np.testing.assert_allclose(t1["6"], t2["6"])


def test_extrack_2_matrix_many_states_column_order():
    """pred columns in NUMERIC suffix order (a lexicographic sort scrambles
    >= 11 states: pred_0, pred_1, pred_10, ..., pred_2, ...)."""
    S = 12
    tracks = {"3": np.zeros((1, 3, 2))}
    preds = {"3": np.tile(np.arange(S, dtype=float)[None, None], (1, 3, 1))}
    m = exporters.extrack_2_matrix(tracks, preds, 0.02)
    np.testing.assert_allclose(m[0, 4:], np.arange(S))
