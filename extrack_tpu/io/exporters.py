"""Exporters: fitted parameters and annotated tracks to JSON/CSV/XML/pandas.

Functional equivalents of extrack/exporters.py: save_params (:7-26),
extrack_2_matrix (:28-53), extrack_2_pandas (:58-102),
save_extrack_2_CSV (:152-177), save_extrack_2_xml (:179-228) and the
TrackMate-compatible save_extrack_2_input_xml (:231-319, rebuilt with
ElementTree and programmatic feature declarations instead of a hardcoded
string template).
"""
from __future__ import annotations

import json
import pickle
import xml.etree.ElementTree as ET
from typing import Dict

import numpy as np
import pandas as pd

from extrack_tpu import params as tparams


def _values_of(params) -> Dict[str, float]:
    if isinstance(params, tparams.Parameters):
        return params.valuesdict()
    return {k: float(v) for k, v in dict(params).items()}


def save_params(params, path: str = ".", fmt: str = "json",
                file_name: str = "params"):
    """Persist fitted parameter values (json / pkl / npy / csv).
    Reference: exporters.py:7-26."""
    vals = _values_of(params)
    base = f"{path}/{file_name}"
    if fmt == "npy":
        np.save(base, vals)
    elif fmt == "pkl":
        with open(base + ".pkl", "wb") as fh:
            pickle.dump(vals, fh)
    elif fmt == "json":
        with open(base + ".json", "w") as fh:
            json.dump(vals, fh)
    elif fmt == "csv":
        with open(base + ".csv", "w") as fh:
            for k, v in vals.items():
                fh.write(f"{k},{v}\n")
    else:
        raise ValueError("format not supported, use 'json', 'pkl', 'npy' "
                         "or 'csv'")


def load_params(path: str) -> tparams.Parameters:
    """Load values saved by save_params into a (fixed) Parameters object."""
    if path.endswith(".json"):
        with open(path) as fh:
            vals = json.load(fh)
    elif path.endswith(".pkl"):
        with open(path, "rb") as fh:
            vals = pickle.load(fh)
    elif path.endswith(".npy"):
        vals = np.load(path, allow_pickle=True).item()
    else:
        raise ValueError("expected a .json/.pkl/.npy file")
    if "values" in vals and isinstance(vals["values"], dict):
        vals = vals["values"]          # CLI fit-result payload
    spec = tparams.Parameters()
    for k, v in vals.items():
        spec.add(k, float(v), vary=False)
    return spec


def _default_frames(all_tracks):
    return {l: np.repeat(np.arange(int(l))[None], len(all_tracks[l]), 0)
            for l in all_tracks}


def extrack_2_pandas(all_tracks, pred_Bs, frames=None, opt_metrics=None
                     ) -> pd.DataFrame:
    """Flatten (tracks, posteriors) dicts into one DataFrame with pred_i
    columns.  Reference: exporters.py:58-102."""
    opt_metrics = opt_metrics or {}
    if frames is None:
        frames = _default_frames(all_tracks)
    nb_dims = next(iter(all_tracks.values())).shape[2]
    nb_states = next(iter(pred_Bs.values())).shape[2]

    parts = []
    track_id = 0
    for l in all_tracks:
        arr = all_tracks[l]
        b, t, _ = arr.shape
        cols = {}
        for d, name in enumerate(["POSITION_X", "POSITION_Y",
                                  "POSITION_Z"][:nb_dims]):
            cols[name] = arr[:, :, d].reshape(-1)
        cols["FRAME"] = np.asarray(frames[l]).reshape(-1).astype(int)
        cols["TRACK_ID"] = np.repeat(np.arange(track_id, track_id + b), t)
        for s in range(nb_states):
            cols[f"pred_{s}"] = pred_Bs[l][:, :, s].reshape(-1)
        for m in opt_metrics:
            cols[m] = np.asarray(opt_metrics[m][l]).reshape(-1)
        parts.append(pd.DataFrame(cols))
        track_id += b
    return pd.concat(parts, ignore_index=True)


def extrack_2_matrix(all_tracks, pred_Bs, dt, all_frames=None) -> np.ndarray:
    """Flat numeric matrix [x, y(, z), track_id, frame, pred_0..] — the
    reference's column order (exporters.py:28-53 concatenates positions,
    track IDs, frames, predictions), which differs from the DataFrame's
    FRAME-before-TRACK_ID layout."""
    df = extrack_2_pandas(all_tracks, pred_Bs, frames=all_frames)
    pos = [c for c in ("POSITION_X", "POSITION_Y", "POSITION_Z")
           if c in df.columns]
    # numeric suffix order: a lexicographic sort scrambles >= 11 states
    preds = sorted((c for c in df.columns if c.startswith("pred_")),
                   key=lambda c: int(c.split("_")[1]))
    return df[pos + ["TRACK_ID", "FRAME"] + preds].to_numpy(np.float64)


# the reference ships two implementations of the same flattening
# (exporters.py:58 and :105); one suffices here
extrack_2_pandas2 = extrack_2_pandas


def save_extrack_2_CSV(path, all_tracks, pred_Bss, dt, all_frames=None):
    """CSV with TRACK_ID, 3D positions, time, frame and per-state
    predictions.  Reference: exporters.py:152-177."""
    if all_frames is None:
        all_frames = _default_frames(all_tracks)
    nb_states = next(iter(pred_Bss.values())).shape[2]
    with open(path, "w") as fh:
        pred_hdr = "".join(f"PRED_{k}," for k in range(nb_states))
        fh.write(f"TRACK_ID,POSITION_X,POSITION_Y,POSITION_Z,POSITION_T,"
                 f"FRAME,{pred_hdr}\n")
        track_id = 0
        for l in all_tracks:
            arr = all_tracks[l]
            pos3 = np.zeros((arr.shape[0], arr.shape[1], 3))
            pos3[:, :, :arr.shape[2]] = arr
            for track, preds, frames in zip(pos3, pred_Bss[l],
                                            all_frames[l]):
                track_id += 1
                for pos, p, frame in zip(track, preds, frames):
                    pred_str = ",".join(str(v) for v in p)
                    fh.write(f"{track_id},{pos[0]},{pos[1]},{pos[2]},"
                             f"{dt * frame * 1000},{int(frame)},{pred_str}\n")


def _params_attr(params) -> str:
    vals = _values_of(params)
    return " ".join(f"{k}='{np.round(v, 8)}'" for k, v in vals.items()
                    if "_" not in k)


def save_extrack_2_xml(all_tracks, pred_Bss, params, path, dt,
                       all_frames=None, opt_metrics=None):
    """TrackMate-'Tracks'-style XML with per-detection predictions.
    Reference: exporters.py:179-228."""
    opt_metrics = opt_metrics or {}
    if all_frames is None:
        all_frames = _default_frames(all_tracks)
    n_tracks = sum(len(all_tracks[l]) for l in all_tracks)
    root = ET.Element("Tracks", nTracks=str(n_tracks), spaceUnits="µm",
                      frameInterval=str(dt), timeUnits="ms")
    root.set("ExTrack_results", _params_attr(params))
    for l in all_tracks:
        arr = all_tracks[l]
        pos3 = np.zeros((arr.shape[0], arr.shape[1], 3))
        pos3[:, :, :arr.shape[2]] = arr
        for i, (track, preds, frames) in enumerate(
                zip(pos3, pred_Bss[l], all_frames[l])):
            particle = ET.SubElement(root, "particle", nSpots=str(l))
            for j, (pos, p, frame) in enumerate(zip(track, preds, frames)):
                det = ET.SubElement(particle, "detection",
                                    t=str(int(frame)), x=str(pos[0]),
                                    y=str(pos[1]), z=str(pos[2]))
                for s, v in enumerate(p):
                    det.set(f"pred_{s}", str(v))
                for m in opt_metrics:
                    det.set(m, str(opt_metrics[m][l][i][j]))
    ET.indent(root)
    ET.ElementTree(root).write(path, encoding="utf-8",
                               xml_declaration=True)


_SPOT_FEATURES = [
    ("QUALITY", "Quality", "QUALITY", False),
    ("POSITION_X", "X", "POSITION", False),
    ("POSITION_Y", "Y", "POSITION", False),
    ("POSITION_Z", "Z", "POSITION", False),
    ("POSITION_T", "T", "TIME", False),
    ("FRAME", "Frame", "NONE", True),
    ("RADIUS", "Radius", "LENGTH", False),
    ("VISIBILITY", "Visibility", "NONE", True),
]
_TRACK_FEATURES = [
    ("TRACK_INDEX", "Track index", "NONE", True),
    ("TRACK_ID", "Track ID", "NONE", True),
    ("NUMBER_SPOTS", "Number of spots in track", "NONE", True),
    ("TRACK_DURATION", "Track duration", "TIME", False),
    ("TRACK_START", "Track start", "TIME", False),
    ("TRACK_STOP", "Track stop", "TIME", False),
]
_EDGE_FEATURES = [
    ("SPOT_SOURCE_ID", "Source spot ID", "NONE", True),
    ("SPOT_TARGET_ID", "Target spot ID", "NONE", True),
    ("EDGE_TIME", "Edge time", "TIME", False),
]


def save_extrack_2_input_xml(all_tracks, pred_Bss, params, path, dt,
                             all_frames=None, opt_metrics=None):
    """Full TrackMate-file XML loadable by the TrackMate GUI plugin.

    Reference: exporters.py:231-319.  Rebuilt programmatically: a Model
    section with feature declarations + AllSpots/AllTracks/FilteredTracks,
    per-spot EXTRACK probability features, and minimal Settings.
    """
    opt_metrics = opt_metrics or {}
    if all_frames is None:
        all_frames = _default_frames(all_tracks)
    nb_states = next(iter(pred_Bss.values())).shape[2]

    tm = ET.Element("TrackMate", version="7.7.2")
    model = ET.SubElement(tm, "Model", spatialunits="µm", timeunits="s")
    model.set("ExTrack_results", _params_attr(params))
    decl = ET.SubElement(model, "FeatureDeclarations")

    def _features(parent_name, feats):
        parent = ET.SubElement(decl, parent_name)
        for feature, name, dim, isint in feats:
            ET.SubElement(parent, "Feature", feature=feature, name=name,
                          shortname=name, dimension=dim,
                          isint=str(isint).lower())
        return parent

    spot_feats = _features("SpotFeatures", _SPOT_FEATURES)
    for s in range(nb_states):
        ET.SubElement(spot_feats, "Feature", feature=f"EXTRACK_P_{s}",
                      name=f"Probability state {s}", shortname=f"P {s}",
                      dimension="NONE", isint="false")
    _features("EdgeFeatures", _EDGE_FEATURES)
    _features("TrackFeatures", _TRACK_FEATURES)

    # spots, grouped per frame
    n_spots = sum(all_tracks[l].shape[0] * all_tracks[l].shape[1]
                  for l in all_tracks)
    all_spots = ET.SubElement(model, "AllSpots", nspots=str(n_spots))
    frames_present = sorted({int(f) for l in all_frames
                             for f in np.asarray(all_frames[l]).ravel()})
    spot_ids = {l: np.zeros(np.asarray(all_frames[l]).shape, dtype=int)
                for l in all_tracks}
    spot_id = 0
    for frame in frames_present:
        sif = ET.SubElement(all_spots, "SpotsInFrame", frame=str(frame))
        for l in all_tracks:
            arr = all_tracks[l]
            frs = np.asarray(all_frames[l])
            hits = np.argwhere(frs == frame)
            for (i, j) in hits:
                pos = np.zeros(3)
                pos[:arr.shape[2]] = arr[i, j]
                spot = ET.SubElement(
                    sif, "Spot", ID=str(spot_id), name=f"ID{spot_id}",
                    VISIBILITY="1", RADIUS="0.25", QUALITY="1.0",
                    POSITION_T=str(frame * dt), POSITION_X=str(pos[0]),
                    POSITION_Y=str(pos[1]), POSITION_Z=str(pos[2]),
                    FRAME=str(frame))
                for s in range(nb_states):
                    spot.set(f"EXTRACK_P_{s}", str(pred_Bss[l][i, j, s]))
                spot_ids[l][i, j] = spot_id
                spot_id += 1

    all_tr = ET.SubElement(model, "AllTracks")
    track_id = 0
    for l in all_tracks:
        frs = np.asarray(all_frames[l])
        for i in range(all_tracks[l].shape[0]):
            fr = frs[i]
            tr = ET.SubElement(
                all_tr, "Track", name=f"Track_{track_id}",
                TRACK_ID=str(track_id), TRACK_INDEX=str(track_id),
                NUMBER_SPOTS=str(int(l)),
                TRACK_DURATION=str((fr[-1] - fr[0]) * dt),
                TRACK_START=str(fr[0] * dt), TRACK_STOP=str(fr[-1] * dt))
            for j in range(1, int(l)):
                ET.SubElement(tr, "Edge",
                              SPOT_SOURCE_ID=str(spot_ids[l][i, j - 1]),
                              SPOT_TARGET_ID=str(spot_ids[l][i, j]),
                              EDGE_TIME=str((fr[j - 1] + 0.5) * dt))
            track_id += 1
    filtered = ET.SubElement(model, "FilteredTracks")
    for t in range(track_id):
        ET.SubElement(filtered, "TrackID", TRACK_ID=str(t))
    settings = ET.SubElement(tm, "Settings")
    ET.SubElement(settings, "ImageData", filename="blank", folder="",
                  width="512", height="512", nslices="1",
                  nframes=str(max(frames_present) + 1),
                  pixelwidth="1.0", pixelheight="1.0", voxeldepth="0.0",
                  timeinterval=str(dt))
    ET.indent(tm)
    ET.ElementTree(tm).write(path, encoding="utf-8", xml_declaration=True)
