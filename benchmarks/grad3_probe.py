"""Per-construct cost probe for the 3-state gradient kernel (K=243).

The roofline (benchmarks/roofline.json) shows the 3-state value_and_grad
walk sustaining 320 Gop/s vs the 517 Gop/s VMEM-roundtrip floor the
2-state walk reaches — ~1.6x headroom.  The 2-state walk's remaining
costs were proven bandwidth-bound; at 3-state the structural differences
are (a) K=243 is odd, so the per-slot interleaves take the
scratch-laundering path instead of the MXU permutation dot, and (b) the
(G, A, BLK) reshape gathers stride A=3 over non-8-aligned sublanes.

This probe times each suspect construct in isolation on the real chip,
at the real kernel's shapes (K=243, G=81, A=3, BLK=256), by n_iter
differencing (constant dispatch/sync costs cancel).  Output: one JSON
blob (benchmarks/grad3_probe.json) of ns per construct-invocation per
block, to decide which redesign actually pays before writing it.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/grad3_probe.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

K, A, BLK = 243, 3, 256
G = K // A
K8 = -(-K // 8) * 8          # 248


def best_of(fn, rounds=4):
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def _mix(acc, s):
    """Fold a (G, BLK) result back into the (K, BLK) carry (tile is the
    cheap native op; keeps every variant's loop body live end-to-end)."""
    return acc * 0.5 + pltpu.repeat(s, A, axis=0)


def _kernel(x_ref, o_ref, nrm, *, n_iter, variant):
    iperm = None
    if variant.startswith("mxu"):
        r = jax.lax.broadcasted_iota(jnp.int32, (K8, K8), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (K8, K8), 1)
        iperm = (((r % A) * G + r // A == c) & (r < K)).astype(jnp.float32)
        if variant == "mxu_bf16":
            iperm = iperm.astype(jnp.bfloat16)

    def interleave_launder(parts):
        v = jnp.concatenate([p[:, None] for p in parts],
                            axis=1).reshape(K, -1)
        nrm[pl.ds(0, 1)] = v[None]
        return nrm[pl.ds(0, 1)][0]

    def interleave_mxu(parts, precision):
        v = jnp.concatenate(parts, axis=0)
        v = jnp.concatenate(
            [v, jnp.zeros((K8 - K, v.shape[1]), v.dtype)], axis=0)
        out = jax.lax.dot(iperm.astype(jnp.float32), v,
                          precision=precision)
        return out[:K]

    def interleave_mxu_bf16(parts):
        # exact f32 via 3-way bf16 split of v (iperm is 0/1: exact in
        # bf16); each dot is a single MXU pass vs HIGHEST's 6
        v = jnp.concatenate(parts, axis=0)
        v = jnp.concatenate(
            [v, jnp.zeros((K8 - K, v.shape[1]), v.dtype)], axis=0)
        hi = v.astype(jnp.bfloat16)
        r1 = v - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        out = (jax.lax.dot(iperm, hi, preferred_element_type=jnp.float32)
               + jax.lax.dot(iperm, mid,
                             preferred_element_type=jnp.float32)
               + jax.lax.dot(iperm, lo,
                             preferred_element_type=jnp.float32))
        return out[:K]

    def body(i, acc):
        fi = (i + 1).astype(jnp.float32) * 1e-6
        if variant == "fma10":
            # calibration: 10 dependent fmas on the (K, BLK) block
            for _ in range(10):
                acc = acc * 0.999 + 1e-4
            return acc
        if variant == "launder":
            parts = [acc[o * G:(o + 1) * G] * (1.0 + fi) for o in range(A)]
            return acc * 0.5 + interleave_launder(parts)
        if variant == "mxu_highest":
            parts = [acc[o * G:(o + 1) * G] * (1.0 + fi) for o in range(A)]
            return acc * 0.5 + interleave_mxu(
                parts, jax.lax.Precision.HIGHEST)
        if variant == "mxu_default":
            parts = [acc[o * G:(o + 1) * G] * (1.0 + fi) for o in range(A)]
            return acc * 0.5 + interleave_mxu(
                parts, jax.lax.Precision.DEFAULT)
        if variant == "mxu_bf16":
            parts = [acc[o * G:(o + 1) * G] * (1.0 + fi) for o in range(A)]
            return acc * 0.5 + interleave_mxu_bf16(parts)
        if variant == "gather_mid":
            # the fusion-side construct: (K,BLK) -> (G,A,BLK) reshape,
            # stride-A sublane gathers [:, o], weighted sum (the m_f /
            # t_f rebuild shape)
            c3 = acc.reshape(G, A, BLK)
            s = c3[:, 0] * 0.3
            for o in range(1, A):
                s = s + c3[:, o] * (0.3 + 0.1 * o + fi)
            return _mix(acc, s)
        if variant == "untile_lead":
            # the untile construct: (K,BLK) -> (A,G,BLK), contiguous
            # leading slices, sum over A
            c3 = acc.reshape(A, G, BLK)
            s = c3[0]
            for a in range(1, A):
                s = s + c3[a] * (1.0 + fi)
            return _mix(acc, s)
        if variant == "slice_contig":
            # contiguous (non-8-aligned) G-row slices, no reshape
            s = acc[0:G]
            for a in range(1, A):
                s = s + acc[a * G:(a + 1) * G] * (1.0 + fi)
            return _mix(acc, s)
        if variant == "repeat_tile":
            s = acc[0:G] * (1.0 + fi)
            return _mix(acc, s)   # repeat only
        raise ValueError(variant)

    o_ref[:] = jax.lax.fori_loop(0, n_iter, body, x_ref[:])


def build(variant, n_iter, grid=16):
    call = pl.pallas_call(
        functools.partial(_kernel, n_iter=n_iter, variant=variant),
        grid=(grid,),
        in_specs=[pl.BlockSpec((K, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, BLK * grid), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, K, BLK), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    return jax.jit(lambda x, c=call: jnp.sum(c(x)))


def measure(variant, n_iter=2048, grid=16):
    x = jnp.full((K, BLK * grid), 0.7, jnp.float32)
    fns = {}
    for ni in (n_iter, 2 * n_iter):
        f = build(variant, ni, grid)
        float(f(x))
        fns[ni] = f
    t1 = best_of(lambda: fns[n_iter](x))
    t2 = best_of(lambda: fns[2 * n_iter](x))
    # ns per invocation per (K, BLK) block
    return (t2 - t1) / n_iter / grid * 1e9


def main():
    out = {"K": K, "A": A, "G": G, "BLK": BLK,
           "device": jax.devices()[0].device_kind, "ns_per_block": {}}
    variants = ["fma10", "launder", "mxu_highest", "mxu_default",
                "mxu_bf16", "gather_mid", "untile_lead", "slice_contig",
                "repeat_tile"]
    for v in variants:
        try:
            ns = measure(v)
        except Exception as e:                    # noqa: BLE001
            out["ns_per_block"][v] = f"failed: {type(e).__name__}: {e}"
            print(f"{v:>14}: FAILED {e}")
            continue
        out["ns_per_block"][v] = round(ns, 1)
        print(f"{v:>14}: {ns:8.1f} ns/block")
    with open(os.path.join(_HERE, "grad3_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
