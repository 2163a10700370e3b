"""Microbenchmark: value_and_grad throughput of the fit objective.

The fit driver's hot call is one jitted value_and_grad of the bucketed
Pallas objective per optimizer evaluation (fit.py).  This measures it on
the bench.py configuration (2-state, T=10, window 6, 1M tracks, lengths
3..10 length-bucketed) so kernel changes to ops/pallas_grad.py can be
attributed directly.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/grad_bench.py
Prints one JSON line {"fwd_tracks_per_s", "vg_tracks_per_s", ...}.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

B, T, D = 1 << 20, 10, 2
MIN_LEN = 3


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=None,
                    help="lane block override for the grad kernel "
                         "(capped per bucket by supported_block)")
    ap.add_argument("--states", type=int, default=2)
    ap.add_argument("--window", type=int, default=None,
                    help="default: the per-state-count schedule")
    ap.add_argument("--batch", type=int, default=B)
    args = ap.parse_args()
    from extrack_tpu import data as tdata, fit, params as tparams, simulate

    nb = args.batch
    S = args.states
    W = args.window if args.window else fit.default_window(S)
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    Ds = jnp.asarray(np.linspace(0.0, 0.08, S))
    frac = jnp.full((S,), 1.0 / S)
    tr = jnp.full((S, S), 0.1 / max(S - 1, 1))
    tr = tr.at[jnp.arange(S), jnp.arange(S)].set(0.9)
    xs, _ = simulate.brownian_frames(key, nb, T, Ds, frac, tr,
                                     0.02, 0.02, D)
    rng = np.random.default_rng(1)
    lengths = rng.integers(MIN_LEN, T + 1, nb).astype(np.int32)
    xs_np = np.asarray(xs.astype(dtype))
    tracks = {str(L): xs_np[lengths == L][:, :L]
              for L in np.unique(lengths)}
    batches = tdata.from_dict_bucketed(tracks, max_buckets=8, dtype=dtype)

    spec = tparams.generate_params(nb_states=S, LocErr_type=1, D_max=1.0,
                                   estimated_Ds=list(
                                       np.linspace(0.001, 0.05, S)))
    obj = fit.make_objective(batches, spec, 0.02, S, cell_dims=(0.5,),
                             window=W, min_len=MIN_LEN,
                             pallas_block=args.block)
    data = jax.device_put(obj.batches)
    z0 = jnp.asarray(spec.to_unconstrained(), dtype)

    f_only = jax.jit(obj)
    vg = jax.jit(jax.value_and_grad(obj))

    import sys
    print("compiling forward...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    f_only(z0, data).block_until_ready()
    fwd_compile = time.perf_counter() - t0
    print(f"forward compiled in {fwd_compile:.1f}s; compiling vg...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(vg(z0, data))
    vg_compile = time.perf_counter() - t0
    print(f"vg compiled in {vg_compile:.1f}s", file=sys.stderr, flush=True)

    def best_of(fn, rounds=3, reps=5):
        best = np.inf
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(reps):
                jax.block_until_ready(fn(z0, data))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    dt_f = best_of(f_only)
    dt_vg = best_of(vg)
    print(json.dumps({
        "fwd_tracks_per_s": round(nb / dt_f, 1),
        "vg_tracks_per_s": round(nb / dt_vg, 1),
        "fwd_s": round(dt_f, 4), "vg_s": round(dt_vg, 4),
        "fwd_compile_s": round(fwd_compile, 1),
        "vg_compile_s": round(vg_compile, 1),
        "uses_pallas": obj.uses_pallas,
        "block": args.block, "states": S, "window": W, "batch": nb,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
