"""CLI smoke tests (subprocess, CPU backend)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    return subprocess.run([sys.executable, "-m", "extrack_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=cwd,
                          timeout=600)


@pytest.mark.slow
def test_cli_pipeline(tmp_path):
    sim = _run(["simulate", "--n-tracks", "150", "--max-len", "8",
                "--min-len", "4", "--seed", "1", "-o",
                str(tmp_path / "sim.csv")], cwd=str(tmp_path))
    assert sim.returncode == 0, sim.stderr[-2000:]
    fit = _run(["fit", str(tmp_path / "sim.csv"), "--dt", "0.02",
                "--min-len", "4", "--max-len", "8", "--window", "3",
                "--cell-dims", "0.5", "-o", str(tmp_path / "fit.json")],
               cwd=str(tmp_path))
    assert fit.returncode == 0, fit.stderr[-2000:]
    payload = json.loads(open(tmp_path / "fit.json").read())
    assert payload["success"]
    assert 0.0 <= payload["values"]["F0"] <= 1.0
    pred = _run(["predict", str(tmp_path / "sim.csv"), "--dt", "0.02",
                 "--min-len", "4", "--max-len", "8", "--window", "4",
                 "--params", str(tmp_path / "fit.json"), "-o",
                 str(tmp_path / "pred.csv")], cwd=str(tmp_path))
    assert pred.returncode == 0, pred.stderr[-2000:]
    rows = open(tmp_path / "pred.csv").read().strip().splitlines()
    assert len(rows) > 100 and rows[0].startswith("TRACK_ID")
    samp = _run(["sample", str(tmp_path / "sim.csv"), "--dt", "0.02",
                 "--min-len", "4", "--max-len", "8", "--window", "3",
                 "--cell-dims", "0.5", "--samples", "40", "--warmup", "40",
                 "--chains", "2", "--params", str(tmp_path / "fit.json"),
                 "-o", str(tmp_path / "post.npz")], cwd=str(tmp_path))
    assert samp.returncode == 0, samp.stderr[-2000:]
    post = np.load(tmp_path / "post.npz")
    assert post["D1_minus_D0"].shape == (2, 40)
    assert float(post["accept_rate"]) > 0.1
    # probe: bad input path -> nonzero exit with a readable error
    bad = _run(["fit", str(tmp_path / "missing.csv"), "--dt", "0.02"],
               cwd=str(tmp_path))
    assert bad.returncode != 0
