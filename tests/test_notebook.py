"""Execute the tutorial notebook's code cells end to end (reduced size).

The reference's primary user document is a runnable notebook
(Tutorials/Tutorial_ExTrack.ipynb); ours is
notebooks/Tutorial_ExTrack_TPU.ipynb.  nbclient is not available in this
environment, so the cells are exec'd in order in one namespace — same
effect for a linear tutorial.  Sizes are shrunk so the whole flow runs in
about a minute on the CPU test rig.
"""
import os
import warnings

import matplotlib

matplotlib.use("Agg")

import pytest

nbformat = pytest.importorskip("nbformat")

NB_PATH = os.path.join(os.path.dirname(__file__), os.pardir, "notebooks",
                       "Tutorial_ExTrack_TPU.ipynb")

# keep the tutorial fast on the f64 CPU rig: fewer tracks, same pipeline
SHRINK = [
    ("nb_tracks=2000", "nb_tracks=300"),
    ("max_track_len=12", "max_track_len=10"),
]


def test_tutorial_notebook_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # notebook writes exports to its cwd
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        nb = nbformat.read(NB_PATH, as_version=4)
    ns = {"__name__": "__tutorial__"}
    for idx, cell in enumerate(nb.cells):
        if cell.cell_type != "code":
            continue
        src = cell.source
        for old, new in SHRINK:
            src = src.replace(old, new)
        try:
            exec(compile(src, f"<cell {idx}>", "exec"), ns)
        except Exception as exc:  # pragma: no cover - diagnostic
            pytest.fail(f"notebook cell {idx} failed: {exc!r}\n--- source:\n"
                        f"{src}")
        matplotlib.pyplot.close("all")
    # the fit cell must have recovered sane parameters
    fitted = ns["model_fit"].params.valuesdict()
    assert 0.15 < fitted["D1"] < 0.4
    assert fitted["D0"] < 0.05
    # the annotation cell computed an agreement fraction
    assert ns["agree"] / ns["n_tot"] > 0.75
