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
