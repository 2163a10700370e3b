"""Sweep the lane-block size of the post-fit Pallas kernels on TPU.

The drivers never pass ``block=`` to predict/hist/refine, so the kernel
defaults decide the pipeline depth per grid step.  The fit objective's
grad kernel went 5.6M -> 6.9M tracks/s moving 256 -> 1024; this measures
the same knob for the other three kernels so their defaults can be set
from data instead of caution.

Timing note: through the axon tunnel, ``block_until_ready`` on a large
kernel output can return before the work is observable — every timed
call here fetches a jit-reduced scalar of the outputs instead, which
serializes on the full computation (cost: one ~28 ms sync per call).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/block_sweep.py
Prints one JSON line per (kernel, block).
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

B, T, D = 1 << 20, 10, 2
MIN_LEN = 3


def best_of(fn, rounds=3, reps=3):
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            float(fn())
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    from extrack_tpu import simulate
    from extrack_tpu.core import tables as ttables
    from extrack_tpu.ops import pallas_hist, pallas_predict, pallas_refine

    key = jax.random.PRNGKey(0)
    xs, _ = simulate.brownian_frames(key, B, T, jnp.asarray([0.0, 0.08]),
                                     jnp.asarray([0.5, 0.5]),
                                     jnp.asarray([[0.9, 0.1], [0.1, 0.9]]),
                                     0.02, 0.02, D)
    xs = jax.device_put(xs.astype(jnp.float32))
    rng = np.random.default_rng(1)
    lengths = jnp.asarray(np.sort(rng.integers(MIN_LEN, T + 1, B))
                          .astype(np.int32))
    isbl = jnp.ones((B,), jnp.float32)

    Ds = np.array([0.0, 0.08])
    Fs = np.array([0.5, 0.5])
    rates = np.array([[0.9, 0.1], [0.1, 0.9]])
    tb = ttables.build_tables(Ds, 0.02, Fs, rates, 0.05, 0.02,
                              cell_dims=(0.5,))

    log_trans = jnp.log(jnp.asarray(rates, jnp.float32))
    sig2 = jnp.asarray(2 * Ds * 0.02, jnp.float32)
    le2 = jnp.asarray(0.02 ** 2, jnp.float32)[None, None, None]

    @functools.partial(jax.jit, static_argnames="blk")
    def run_predict(xs, lengths, isbl, blk):
        logl, preds = pallas_predict.predict_pallas(
            xs, lengths, isbl, tb, window=5, min_len=MIN_LEN, block=blk)
        return logl.sum() + preds.sum()

    @functools.partial(jax.jit, static_argnames="blk")
    def run_hist(xs, lengths, isbl, blk):
        return pallas_hist.hist_pallas(
            xs, lengths, isbl, tb, window=7, min_len=MIN_LEN,
            block=blk).sum()

    @functools.partial(jax.jit, static_argnames="blk")
    def run_refine(xs, lengths, blk):
        mu, sigma = pallas_refine.refine_pallas(
            xs, lengths, le2, log_trans, sig2, window=7, block=blk)
        return mu.sum() + sigma.sum()

    cases = {
        "predict_W5": (
            pallas_predict.predict_block_cap(T, 5, D, 2 ** 5, 2),
            lambda blk: run_predict(xs, lengths, isbl, blk)),
        "hist_W7": (
            pallas_hist.hist_block_cap(T, D, 2 ** 7, 2),
            lambda blk: run_hist(xs, lengths, isbl, blk)),
        "refine_W7": (
            pallas_refine.refine_block_cap(T, D, 2 ** 7, 2 ** 6, 8),
            lambda blk: run_refine(xs, lengths, blk)),
    }
    for name, (cap, fn) in cases.items():
        seen = set()
        for blk in (128, 256, 512, 1024, 2048):
            blk_eff = min(blk, cap)
            if blk_eff in seen:
                continue
            seen.add(blk_eff)
            t0 = time.perf_counter()
            try:
                float(fn(blk_eff))
            except Exception as e:  # VMEM overflow at cap-sized blocks
                print(json.dumps({"kernel": name, "block": blk_eff,
                                  "error": str(e)[:120]}), flush=True)
                continue
            compile_s = time.perf_counter() - t0
            dt = best_of(lambda: fn(blk_eff))
            print(json.dumps({
                "kernel": name, "block": blk_eff, "cap": cap,
                "tracks_per_s": round(B / dt, 1), "s": round(dt, 4),
                "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
