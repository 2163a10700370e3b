"""Quantify the refinement-window schedule's accuracy cost.

refine.default_window steps the refinement window down per state count
(7/5/4/3 for 2/3/4/5 states) so the VMEM-resident Pallas kernel runs out
of the box (VERDICT r4 #8).  The window sets how many neighbouring frames
inform each refined position; this script measures what shrinking it
actually costs: for simulated 2-/3-/4-state tracks, refine at several
windows and report the RMS displacement of the refined positions (and the
RMS change of the reported sigma) relative to the largest window the XLA
mixture path can still enumerate (its cost is O(S**(2W-3)) per position),
normalized by the localization error.  The window sequence converges
geometrically, so the W_ref - 1 row bounds what W_ref itself still moves.

Runs on CPU float64 (the windows are compared against each other — no
hardware dependence).  Writes benchmarks/refine_window_accuracy.json.

Usage: python benchmarks/refine_window_accuracy.py [--n-tracks N]
"""
import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from extrack_tpu import refine, simulate  # noqa: E402
from extrack_tpu.core import tables as ttables  # noqa: E402


def scenario(S, n, T=12, seed=0):
    rates = np.full((S, S), 0.07) - np.diag(np.full(S, 0.07))
    tm = np.asarray(ttables.transition_matrix(rates, matrix_type=1))
    Ds = np.linspace(0.0, 0.3, S)
    loc_err = 0.02
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=n, max_track_len=T, min_track_len=T, LocErr=loc_err,
        Ds=Ds, TrMat=tm, dt=0.02, pBL=0.02, cell_dims=(0.5, None, None),
        seed=seed)
    ds = np.sqrt(2.0 * Ds * 0.02)
    return tracks, loc_err, ds, tm


def refined(tracks, loc_err, ds, tm, W):
    mus, sigs = refine.position_refinement(
        tracks, loc_err, ds, np.full(len(ds), 1.0 / len(ds)), tm,
        frame_len=W, compute_engine="xla")
    mu = np.concatenate([m.reshape(-1, m.shape[-1]) for m in mus.values()])
    sg = np.concatenate([s.reshape(-1) for s in sigs.values()])
    return mu, sg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-tracks", type=int, default=300)
    args = ap.parse_args()

    out = {}
    for S, w_ref, windows in ((2, 10, (8, 7, 6, 5)), (3, 7, (6, 5, 4)),
                              (4, 6, (5, 4, 3))):
        T = 12
        tracks, loc_err, ds, tm = scenario(S, args.n_tracks, T=T)
        mu_ref, sg_ref = refined(tracks, loc_err, ds, tm, w_ref)
        rows = {}
        for W in windows:
            mu, sg = refined(tracks, loc_err, ds, tm, W)
            rows[W] = {
                "rms_mu_shift_over_locerr": float(
                    np.sqrt(np.mean((mu - mu_ref) ** 2)) / loc_err),
                "max_mu_shift_over_locerr": float(
                    np.max(np.abs(mu - mu_ref)) / loc_err),
                "rms_sigma_shift_over_locerr": float(
                    np.sqrt(np.mean((sg - sg_ref) ** 2)) / loc_err),
            }
            print(f"S={S} W={W}: rms mu shift "
                  f"{rows[W]['rms_mu_shift_over_locerr']:.2e} loc_err, "
                  f"max {rows[W]['max_mu_shift_over_locerr']:.2e}",
                  flush=True)
        out[f"{S}state"] = {"T": T, "n_tracks": args.n_tracks,
                            "loc_err": loc_err, "reference_window": w_ref,
                            "scheduled_window":
                            refine.default_window(S, T),
                            "windows": rows}

    path = os.path.join(_HERE, "refine_window_accuracy.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
