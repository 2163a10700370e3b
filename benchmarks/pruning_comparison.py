"""Window vs threshold pruning: the accuracy data behind DEVIATIONS.md 1.

Compares, against exact enumeration (frame_len = track length), the
per-track logL error of

  * the fixed-window fusion this framework uses (reference
    P_Cs_inter_bound_stats, extrack/tracking.py:109-318), and
  * the reference's default similarity-threshold pruning
    (P_Cs_inter_bound_stats_th + fuse_tracks_th, tracking.py:427-743)
    across its default regimes (threshold 0.1-0.2, max_nb_states 120-200),

plus the induced shift of the 1-D likelihood argmax around the true value
for each model parameter (what a fit would actually see).  Both engines are
the NumPy transcriptions in extrack_tpu.baselines, so the comparison is
pruning-rule-only.  Run: python benchmarks/pruning_comparison.py
"""
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root, cwd-independent

from extrack_tpu import baselines  # noqa: E402

B, T, D = 300, 14, 2
TRUE = dict(loc_err=0.02, ds=np.array([0.0, np.sqrt(2 * 0.08 * 0.02)]),
            Fs=np.array([0.45, 0.55]),
            TrMat=np.array([[0.9, 0.1], [0.15, 0.85]]),
            pBL=0.05, isBL=1, cell_dims=(0.5,), min_len=3)


def simulate(seed=0):
    """2-state Markov tracks with localization noise (ground truth from
    the same generative model the likelihood assumes)."""
    rng = np.random.default_rng(seed)
    states = np.zeros((B, T), dtype=int)
    states[:, 0] = rng.random(B) < TRUE["Fs"][1]
    for t in range(1, T):
        p1 = TRUE["TrMat"][states[:, t - 1], 1]
        states[:, t] = rng.random(B) < p1
    steps = rng.normal(0, 1, (B, T, D)) * TRUE["ds"][states][:, :, None]
    pos = np.cumsum(np.concatenate(
        [np.zeros((B, 1, D)), steps[:, 1:]], axis=1), axis=1)
    return pos + rng.normal(0, TRUE["loc_err"], (B, T, D))


def main():
    Cs = simulate()
    t0 = time.time()
    exact = baselines.reference_log_likelihood(Cs, frame_len=T, **TRUE)
    print(f"# exact enumeration ({2 ** T} sequences): {time.time() - t0:.1f}s",
          flush=True)

    cases = [("window fl=6", "window", dict(frame_len=6)),
             ("window fl=7", "window", dict(frame_len=7)),
             ("window fl=8", "window", dict(frame_len=8)),
             ("thresh 0.2/120 fl=6", "th",
              dict(frame_len=6, threshold=0.2, max_nb_states=120)),
             ("thresh 0.1/200 fl=6", "th",
              dict(frame_len=6, threshold=0.1, max_nb_states=200)),
             ("thresh 0.1/200 fl=8", "th",
              dict(frame_len=8, threshold=0.1, max_nb_states=200))]

    results = {}
    for name, method, kw in cases:
        p = dict(TRUE)
        fl = kw.pop("frame_len")
        t0 = time.time()
        if method == "window":
            ll = baselines.reference_log_likelihood(Cs, frame_len=fl, **p)
        else:
            ll = baselines.reference_log_likelihood_th(
                Cs, frame_len=fl, **kw, **p)
        d = ll - exact
        results[name] = dict(
            mean_abs=float(np.mean(np.abs(d))),
            max_abs=float(np.max(np.abs(d))),
            total=float(np.sum(d)), secs=round(time.time() - t0, 1))
        print(json.dumps({name: results[name]}), flush=True)

    # ---- 1-D argmax shifts around the truth --------------------------------
    def total_ll(method, **over):
        p = dict(TRUE)
        p.update({k: v for k, v in over.items()
                  if k in ("loc_err", "ds", "Fs", "TrMat", "pBL")})
        if method == "exact":
            return np.sum(baselines.reference_log_likelihood(
                Cs, frame_len=T, **p))
        if method == "window":
            return np.sum(baselines.reference_log_likelihood(
                Cs, frame_len=6, **p))
        return np.sum(baselines.reference_log_likelihood_th(
            Cs, frame_len=6, threshold=0.2, max_nb_states=120, **p))

    scans = {
        "D1": (np.linspace(0.06, 0.10, 9),
               lambda v: dict(ds=np.array([0.0, np.sqrt(2 * v * 0.02)]))),
        "LocErr": (np.linspace(0.016, 0.024, 9),
                   lambda v: dict(loc_err=v)),
        "p01": (np.linspace(0.06, 0.14, 9),
                lambda v: dict(TrMat=np.array([[1 - v, v], [0.15, 0.85]]))),
    }
    shifts = {}
    for pname, (grid, make) in scans.items():
        row = {}
        for method in ("exact", "window", "th"):
            vals = [total_ll(method, **make(v)) for v in grid]
            row[method] = float(grid[int(np.argmax(vals))])
        shifts[pname] = row
        print(json.dumps({f"argmax {pname}": row}), flush=True)

    with open(os.path.join(_HERE, "pruning_comparison.json"), "w") as f:
        json.dump({"logl_error_vs_exact": results,
                   "argmax_shift": shifts,
                   "config": dict(B=B, T=T, D=D)}, f, indent=1)
    print("saved", os.path.join(_HERE, "pruning_comparison.json"))


if __name__ == "__main__":
    main()
