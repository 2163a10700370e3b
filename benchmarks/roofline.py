"""Roofline / MFU analysis of the Pallas kernels on the real TPU.

The likelihood recursion has no matmuls — the MXU is idle by the
algorithm's nature (every op is an elementwise f32 op on the (K, BLK)
register) — so the relevant roofline is the VPU issue rate, not the
headline MXU TFLOP/s.  Three measurements anchor it:

1. **Empirical VPU peaks**: Pallas microkernels running pure dependent
   op chains (fma / mul / add / exp / rsqrt / log / div) on a
   VMEM-resident (256, 512) f32 block.  These measure the attainable
   per-category issue rate on THIS chip through the same Mosaic stack
   the real kernels use — no datasheet numbers needed, and they fold in
   whatever multi-pass cost transcendentals have on the VPU.
2. **HBM bandwidth**: a non-factorable streaming reduce over 1 GiB.
3. **Analytical op counts**: per-track elementwise op counts for the
   forward (ops/pallas_engine.py) and gradient (ops/pallas_grad.py)
   kernels, itemized per kernel phase from the source (as-written ops,
   before any compiler fusion, so the sustained/peak ratio is a LOWER
   bound on real utilization).  Counts are split by category; the
   "fma-equivalent" total weights each category by its measured cost
   relative to the fma rate.

The output is one JSON blob (benchmarks/roofline.json) plus a markdown
table; docs/performance.md's Roofline section is generated from it.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/roofline.py
       [--quick]  (quick: smaller batches, skip 3-state/substeps rows)
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HERE = os.path.dirname(os.path.abspath(__file__))


def best_of(fn, rounds=4):
    """Min wall time of fn(), which MUST return a device scalar: float()
    forces the value to host, which is the only sync the axon tunnel
    honors (block_until_ready can return before the work is observable —
    see benchmarks/block_sweep.py)."""
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def rate_by_differencing(fn_small, fn_big, work_small, work_big):
    """work/s from the TIME DIFFERENCE of a small and a big variant of
    the same program: constant per-call costs (the ~28 ms tunnel sync,
    dispatch, the scalar fetch) cancel exactly."""
    t_small = best_of(fn_small)
    t_big = best_of(fn_big)
    return (work_big - work_small) / max(t_big - t_small, 1e-9)


# ---------------------------------------------------------------------------
# 1. empirical per-category VPU peaks
# ---------------------------------------------------------------------------

_ROWS, _COLS = 256, 512          # 512 KiB f32 block, VMEM-resident
_CHAIN = {
    # bounded fixed-point-ish iterations so 2^14 steps stay finite
    "fma": lambda x: x * 0.999 + 1e-4,          # 2 flops, 1 VPU fma slot
    "mul": lambda x: x * 0.9999999,
    "add": lambda x: x + 1e-9,
    "exp": lambda x: jnp.exp(-x),               # x in (0, 1] stays there
    "rsqrt": lambda x: jax.lax.rsqrt(x + 0.5),  # fixed point near 0.8
    "log": lambda x: jnp.log(x + 2.0),          # ~[0.7, 1.6]
    "div": lambda x: 1.0 / (x + 1.5),           # ~[0.4, 0.7]
}
# ops-per-element each chain step actually issues beyond the measured op
# (the +c / -x guards); subtracted using the measured add rate
_CHAIN_EXTRA = {"fma": 0, "mul": 0, "add": 0, "exp": 0, "rsqrt": 1,
                "log": 1, "div": 1}


def _chain_kernel(x_ref, o_ref, *, n_iter, op, unroll):
    """u dependent ops per loop iteration: at u=1 every op pays a VMEM
    round trip of the (256, 512) block (the loop carry lives in VMEM, not
    vector registers), so the measured rate is the VMEM-roundtrip floor;
    at u=8 eight ops share one round trip and the rate approaches the
    VPU issue ceiling."""
    fn = _CHAIN[op]

    def body(i, x):
        for _ in range(unroll):
            x = fn(x)
        return x

    o_ref[:] = jax.lax.fori_loop(0, n_iter, body, x_ref[:])


def measure_vpu_peaks(n_iter=8192, grid=64):
    """Element-ops/s per category, by n_iter differencing (2x vs 1x):
    the serial chain has 131k elements of ILP per grid step, and the
    per-call constants (tunnel sync, pipeline fill) cancel in the
    difference."""
    x = jnp.full((_ROWS, _COLS * grid), 0.7, jnp.float32)

    def chain_rate(op, unroll):
        fns = {}
        for ni in (n_iter, 2 * n_iter):
            call = pl.pallas_call(
                functools.partial(_chain_kernel, n_iter=ni, op=op,
                                  unroll=unroll),
                grid=(grid,),
                in_specs=[pl.BlockSpec((_ROWS, _COLS), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((_ROWS, _COLS), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((_ROWS, _COLS * grid),
                                               jnp.float32),
            )
            f = jax.jit(lambda x, c=call: jnp.sum(c(x)))
            float(f(x))                       # compile
            fns[ni] = f
        work = _ROWS * _COLS * grid * n_iter * unroll
        return rate_by_differencing(
            lambda: fns[n_iter](x), lambda: fns[2 * n_iter](x),
            work, 2 * work)

    # issue-bound ceiling (u=8: ops amortize the block's VMEM round trip)
    peaks = {op: chain_rate(op, 8) for op in _CHAIN}
    # strip the guard-op cost measured at the add rate
    add_rate = peaks["add"]
    for op, extra in _CHAIN_EXTRA.items():
        if extra:
            t_tot = 1.0 / peaks[op]
            t_op = t_tot - extra / add_rate
            # the subtraction overshoots when the op is nearly free next
            # to its guard (log measured "faster than add"): no elementwise
            # op beats the mul/add issue rate, so cap there
            peaks[op] = min(1.0 / max(t_op, 1e-15), peaks["mul"])
    # VMEM-roundtrip floor: one op per load+store of the block
    floor = chain_rate("fma", 1)
    return peaks, floor


def measure_hbm_bw(gib=1.0):
    """Streaming read bandwidth: sum |X - c_i| cannot be factored into a
    precomputed reduce, so X is re-read every scan step; rep-count
    differencing cancels the sync."""
    n = int(gib * (1 << 30) / 4)
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9

    @jax.jit
    def f(x, cs):
        def body(s, c):
            return s + jnp.sum(jnp.abs(x - c)), None
        return jax.lax.scan(body, 0.0, cs)[0]

    cs4 = jnp.linspace(0.0, 1.0, 4)
    cs12 = jnp.linspace(0.0, 1.0, 12)
    float(f(x, cs4)), float(f(x, cs12))       # compile both shapes
    return rate_by_differencing(lambda: f(x, cs4), lambda: f(x, cs12),
                                n * 4 * 4, n * 4 * 12)


# ---------------------------------------------------------------------------
# 2. analytical per-track op counts (itemized from the kernel sources)
# ---------------------------------------------------------------------------

def _zero():
    return {"arith": 0.0, "exp": 0.0, "rsqrt": 0.0, "log": 0.0, "div": 0.0}


def _acc(tot, times=1.0, **cats):
    for k, v in cats.items():
        tot[k] += times * v
    return tot


def forward_ops(S, W, n, D, L):
    """Per-track element-op counts of ops/pallas_engine._kernel (constant
    dt), itemized per phase.  L = track length; the fori_loop runs
    t = 1..L-2 (L-2 prep evaluations), fusion fires on t < L-2 (L-3
    times) and the look-ahead closing once, at t = L-2."""
    K, A = S ** W, S ** n
    G = K // A
    t = _zero()
    # prep (pallas_engine.py:192-203), per dim: tot(+), inv(*), diff(-),
    # prod(*), quad(3*+1+), new_m(3*+1+), tail(2*) = 14 arith + 1 rsqrt,
    # all on (K, BLK)
    _acc(t, times=(L - 2) * D * K, arith=14, rsqrt=1)
    # fusion (pallas_engine.py:280-316): base3 sub K; rq3 rsqrt K;
    # mxs (A-1)G max; w[o] = exp()*rq3 -> 2K arith + K exp; sw (A-1)G;
    # inv_sw G max + G div; lp_f G log + G add; per dim m_f/t_f
    # (2A-1)G each + 2G scale + K sel + K add + K sel; lp_new 2K + K sel
    fuse = _zero()
    _acc(fuse, arith=K + (A - 1) * G + 2 * K + (A - 1) * G + 2 * G + G,
         rsqrt=K, exp=K, log=G, div=G)
    _acc(fuse, times=D, arith=2 * (2 * A - 1) * G + 2 * G + 3 * K)
    _acc(fuse, arith=3 * K)
    _acc(t, times=(L - 3), **fuse)
    # look-ahead closing (pallas_engine.py:228-265), once per track:
    # lc = -0.5 log(prod) - quad - c: K log + 3K; per child a: per dim
    # totn 2+, diffn -, prod_n 2*, quad_n 4 -> 9K + K rsqrt; g 5K;
    # max-reduce K; exp-sum 3K + K exp; prod_n *= 2pi*totn adds 1*
    _acc(t, arith=3 * K, log=K)
    _acc(t, times=A, arith=D * 10 * K + 5 * K + K + 3 * K,
         rsqrt=D * K, exp=K)
    return t


def grad_ops(S, W, n, D, L):
    """Per-track element-op counts of ops/pallas_grad's fwd+bwd pair.

    Forward-with-stash: prep (L-2 times) + the wn-normalized fusion
    (L-3 times, same transcendental count as the forward's fusion; the
    stash adds A*G muls for wn and drops the two final inv_sw scales) +
    one traced-VJP look-ahead closing (counted at 3x the primal: primal
    + linearization + transpose).
    Backward walk (interior_bwd, L-3 taken steps): stash-fed — zero
    transcendentals; counts itemized below from pallas_grad.py:235-343.
    Table-cotangent wide accumulators add 3K adds per walk step."""
    K, A = S ** W, S ** n
    G = K // A
    t = forward_ops(S, W, n, D, L)          # prep+fusion+closing primal
    # closing VJP extra (~2x primal on top), once per track
    close = _zero()
    _acc(close, arith=3 * K, log=K)
    _acc(close, times=A, arith=D * 10 * K + 5 * K + K + 3 * K,
         rsqrt=D * K, exp=K)
    _acc(t, times=2.0, **close)
    # fusion stash variant: +A*G muls (wn), -2G scales, + ok sel K
    _acc(t, times=(L - 3), arith=A * G - 2 * G + K)
    # backward walk per taken step (L-3):
    bwd = _zero()
    # new_m/tail rebuild: 6K per dim; m_f/t_f: 2(2A-1)G per dim
    _acc(bwd, times=D, arith=6 * K + 2 * (2 * A - 1) * G)
    # ctk masks (1+2D)K; untile (1+2D)(A-1)G; d_lsv K; sum_ct_s2 (D-1)K
    _acc(bwd, arith=(1 + 2 * D) * (K + (A - 1) * G) + K + (D - 1) * K)
    # fac: G + 5G per dim; ct_bse: A*(4DG + G)
    _acc(bwd, arith=G + 5 * G * D + A * (4 * D * G + G))
    # per-dim pullback: ct_nm/ct_tl parts 2AG; ct_tot ~10K; d_m 7K;
    # d_s2 8K; d_l2 7K (incl. its lane reduce)
    _acc(bwd, times=D, arith=2 * A * G + 32 * K)
    # d_lp: 3K; wide table accumulators: 3K
    _acc(bwd, arith=6 * K)
    _acc(t, times=(L - 3), **bwd)
    return t


def fma_equiv(counts, peaks):
    """Op counts -> fma-slot-equivalents using measured per-category
    rates (an exp costing fma_rate/exp_rate slots etc.)."""
    ref = peaks["fma"]
    return sum(counts[c] * ref / peaks[c if c != "arith" else "mul"]
               for c in counts)


def hbm_bytes_per_track(T, D, per_step_sig2=False, P=0, grad=False):
    """Streamed HBM traffic per track (lane): xs + l2 (T*D f32 each),
    lengths + isbl rows, the 1-f32 output; the grad kernel re-reads
    nothing from HBM (history + stash live in VMEM) and adds only the
    table cotangent blocks (K-sized, amortized over BLK lanes ~ 0)."""
    b = 2 * T * D * 4 + 2 * 4 + 4
    if per_step_sig2:
        b += (T - 1) * P * 4
    return b


def predict_ops(S, W, n, D, L, T):
    """Per-track element-op counts of ops/pallas_predict._kernel (constant
    dt).  The fori_loop runs t = 1..L-1; the history mixing fires on every
    kept step (L-2 times), the look-ahead closing and the harvest once.
    TPS = 8-padded (T+W)*S history rows."""
    K, A = S ** W, S ** n
    G = K // A
    TPS = -(-((T + W) * S) // 8) * 8
    t = _zero()
    # prep (pallas_predict.py:106-117), per dim: 12 arith + 1 div on (K,)
    _acc(t, times=(L - 1) * D * K, arith=12, div=1)
    # lc: K log + 2K
    _acc(t, times=(L - 1), arith=2 * K, log=K)
    # fusion weights (:178-188): subs K, max (A-1)G, exp K, sw (A-1)G,
    # inv_sw G div + G, lp_f G log + G, wn K
    _acc(t, times=(L - 1),
         arith=K + (A - 1) * G + (A - 1) * G + G + G + K, exp=K,
         log=G, div=G)
    # history mixing (:195-209): catv weighted sum (2A-1)*G*TPS; iota
    # writes S*G*TPS sel; repeat K*TPS copy; keep-select K*TPS
    _acc(t, times=(L - 2),
         arith=(2 * A - 1) * G * TPS + S * G * TPS + 2 * K * TPS)
    # register update (:237-251), per dim: 2(2A-1)G + 2 repeats/selects 4K
    _acc(t, times=(L - 1) * D, arith=2 * (2 * A - 1) * G + 4 * K)
    _acc(t, times=(L - 1), arith=3 * K)
    # look-ahead closing, once (same as forward's)
    _acc(t, arith=3 * K, log=K)
    _acc(t, times=A, arith=D * 10 * K + 5 * K + K + 3 * K,
         rsqrt=D * K, exp=K)
    # harvest, once (:212-229): fin 2K, max K, exp K+K, pbar K div;
    # history reduce 2*K*TPS; W*S row selects on TPS rows; the one-hot
    # matmul rides the (idle) MXU — excluded from VPU slots
    _acc(t, arith=4 * K + 2 * K * TPS + W * S * TPS, exp=K, div=K)
    return t


def hist_ops(S, W, n, D, L, T):
    """Per-track element-op counts of ops/pallas_hist._kernel (constant
    dt).  TP = 8-padded T bin rows, ST = S*TP; E = distinct oldest-run
    lengths (= W-1 in the generic case)."""
    K, A = S ** W, S ** n
    G = K // A
    TP = -(-T // 8) * 8
    ST = S * TP
    E = W - 1
    t = _zero()
    # prep + lc + fusion weights: same shapes as predict
    _acc(t, times=(L - 1) * D * K, arith=12, div=1)
    _acc(t, times=(L - 1), arith=2 * K, log=K)
    _acc(t, times=(L - 1),
         arith=K + 2 * (A - 1) * G + 2 * G + K, exp=K, log=G, div=G)
    # run transport (:186-201): shifted concat K*TP copy; sel 4*K*TP
    # (extok mul+add+mul + real_drop select); weighted sum (2A-1)*G*TP;
    # repeat K*TP; keep-select K*TP
    _acc(t, times=(L - 1),
         arith=K * TP + 4 * K * TP + (2 * A - 1) * G * TP + 2 * K * TP)
    # completed + hist transport (:203-216): cmp K*TP; eold scatter S*K*TP
    # mul + K*ST select; hist add K*ST; weighted sum (2A-1)*G*ST; repeat
    # K*ST; keep-select K*ST
    _acc(t, times=(L - 1),
         arith=K * TP + S * K * TP + 2 * K * ST
         + (2 * A - 1) * G * ST + 2 * K * ST)
    # register update
    _acc(t, times=(L - 1) * D, arith=2 * (2 * A - 1) * G + 4 * K)
    _acc(t, times=(L - 1), arith=3 * K)
    # harvest, once (:129-165): fin/softmax ~5K + K exp + K div; boundary
    # shifts E*(K*TP copy + K*TP mul/add); eold scatter S*K*TP + K*ST sel;
    # total+seg 2*K*ST; posterior reduce 2*K*ST; ending select ST
    _acc(t, arith=5 * K + E * 2 * K * TP + S * K * TP + K * ST
         + 4 * K * ST + ST, exp=K, div=K)
    return t


def refine_ops(S, W, D, L):
    """Per-track element-op counts of ops/pallas_refine._kernel.  Two
    register scans (suffix + prefix, ~L steps each) plus, per interior
    position, the pairwise state-matched mixture: S * (K/S)^2 pairs, each
    ~(7D + 10) arith + D div + 1 exp + 1 rsqrt (pallas_refine.py:284-316),
    plus per-side precomputes and the moment-match epilogue."""
    K = S ** W
    KS = K // S
    t = _zero()
    # two scans: prep 12 arith + 1 div per dim, fusion ~ forward's
    _acc(t, times=2 * L * D * K, arith=12, div=1)
    _acc(t, times=2 * L,
         arith=2 * K + 2 * (S - 1) * KS + 2 * KS + K, exp=K, log=K + KS,
         div=KS)
    # per-position side precomputes (:240-267): per dim ~10 arith + 2 div
    # on (K,); rsqrt 2K
    _acc(t, times=(L - 2) * D * K, arith=10, div=2)
    _acc(t, times=(L - 2), rsqrt=2 * K)
    # pairwise mixture per interior position: S*KS^2 pairs
    pairs = S * KS * KS
    _acc(t, times=(L - 2) * pairs, arith=7 * D + 10, div=D)
    _acc(t, times=(L - 2) * pairs, exp=1, rsqrt=1)
    # end products (2 positions, :207-231): per dim 8 arith + 1 div on K
    _acc(t, times=2 * D * K, arith=8, div=1)
    _acc(t, times=2, arith=4 * K, exp=K, rsqrt=K)
    return t


# ---------------------------------------------------------------------------
# 3. measured kernel rows
# ---------------------------------------------------------------------------

def _uniform_batch(B, T, D, seed=0):
    from extrack_tpu import simulate
    key = jax.random.PRNGKey(seed)
    xs, _ = simulate.brownian_frames(key, B, T, jnp.asarray([0.0, 0.08]),
                                     jnp.asarray([0.5, 0.5]),
                                     jnp.asarray([[0.9, 0.1], [0.1, 0.9]]),
                                     0.02, 0.02, D)
    lengths = jnp.full((B,), T, jnp.int32)
    isbl = jnp.ones((B,), jnp.float32)
    return xs.astype(jnp.float32), lengths, isbl


def kernel_row(name, S, W, n, T, B, peaks, D=2):
    """Measured forward + value_and_grad throughput at a uniform-length
    single-bucket config (op counts are exact for uniform L = T)."""
    from extrack_tpu.core import tables as ttables
    from extrack_tpu.ops import pallas_engine, pallas_grad

    xs, lengths, isbl = _uniform_batch(B, T, D)
    rates = np.full((S, S), 0.1) - np.diag(np.full(S, 0.1))
    Ds = np.linspace(0.0, 0.1, S)
    Fs = np.full(S, 1.0 / S)
    tb = ttables.build_tables(jnp.asarray(Ds), jnp.asarray(0.02),
                              jnp.asarray(Fs), jnp.asarray(rates),
                              jnp.asarray(0.05), 0.02, cell_dims=(0.5,),
                              nb_substeps=n)

    # data as jit ARGUMENTS (dev-notes rule: closed-over arrays bake into
    # the executable as constants); R kernel dispatches per timed call
    # with a varying epsilon on the log-trans table so XLA cannot CSE the
    # reps, and rep-count differencing cancels the tunnel sync
    lt0 = tb.log_trans

    def fwd_body(s, eps):
        return s + jnp.sum(pallas_engine.forward_pallas(
            xs, lengths, isbl, tb._replace(log_trans=lt0 + eps),
            window=W, nb_substeps=n, min_len=3)), None

    grad_fn = jax.grad(lambda lt: pallas_grad.neg_log_likelihood(
        xs, lengths, isbl, tb._replace(log_trans=lt),
        window=W, nb_substeps=n, min_len=3, has_len2=False))

    def vg_body(s, eps):
        return s + jnp.sum(grad_fn(lt0 + eps)), None

    fwd = jax.jit(lambda es: jax.lax.scan(fwd_body, 0.0, es)[0])
    vg = jax.jit(lambda es: jax.lax.scan(vg_body, 0.0, es)[0])
    e1 = jnp.zeros((1,), jnp.float32)
    e5 = jnp.linspace(0.0, 1e-6, 5).astype(jnp.float32)
    float(fwd(e1)), float(fwd(e5)), float(vg(e1)), float(vg(e5))
    dt_f = 1.0 / rate_by_differencing(
        lambda: fwd(e1), lambda: fwd(e5), 1, 5)
    dt_vg = 1.0 / rate_by_differencing(
        lambda: vg(e1), lambda: vg(e5), 1, 5)

    rows = {}
    for kind, dt, counts in (
            ("fwd", dt_f, forward_ops(S, W, n, D, T)),
            ("vg", dt_vg, grad_ops(S, W, n, D, T))):
        slots = fma_equiv(counts, peaks)
        tput = B / dt
        sustained = slots * tput
        bytes_pt = hbm_bytes_per_track(T, D)
        rows[kind] = {
            "tracks_per_s": round(tput, 1),
            "ops_per_track": {k: round(v) for k, v in counts.items()},
            "fma_equiv_slots_per_track": round(slots),
            "sustained_gops_per_s": round(sustained / 1e9, 1),
            # fraction of the measured fma ISSUE rate (slots/s, already
            # fma-equivalent-weighted) — not of the 2x flops number
            "pct_of_fma_peak": round(100 * sustained / peaks["fma"], 1),
            "hbm_bytes_per_track": bytes_pt,
            "hbm_gb_per_s": round(tput * bytes_pt / 1e9, 2),
            "arith_intensity_ops_per_byte": round(slots / bytes_pt, 1),
        }
    return {"name": name, "S": S, "W": W, "n": n, "T": T, "B": B, **rows}


def postfit_row(name, kind, S, W, T, B, peaks, D=2):
    """Measured throughput + sustained rate for the posterior ('predict'),
    histogram ('hist'), or refinement ('refine') kernel at a uniform-length
    single-bucket config."""
    from extrack_tpu.core import tables as ttables
    from extrack_tpu.ops import pallas_hist, pallas_predict, pallas_refine

    xs, lengths, isbl = _uniform_batch(B, T, D)
    rates = np.full((S, S), 0.1) - np.diag(np.full(S, 0.1))
    Ds = np.linspace(0.0, 0.1, S)
    Fs = np.full(S, 1.0 / S)
    tb = ttables.build_tables(jnp.asarray(Ds), jnp.asarray(0.02),
                              jnp.asarray(Fs), jnp.asarray(rates),
                              jnp.asarray(0.05), 0.02, cell_dims=(0.5,),
                              nb_substeps=1)
    lt0 = tb.log_trans

    if kind == "predict":
        def body(s, eps):
            logl, preds = pallas_predict.predict_pallas(
                xs, lengths, isbl, tb._replace(log_trans=lt0 + eps),
                window=W, min_len=3)
            return s + jnp.sum(logl) + jnp.sum(preds[:, 0]), None
        counts = predict_ops(S, W, 1, D, T, T)
    elif kind == "hist":
        def body(s, eps):
            h = pallas_hist.hist_pallas(
                xs, lengths, isbl, tb._replace(log_trans=lt0 + eps),
                window=W, min_len=3)
            return s + jnp.sum(h), None
        counts = hist_ops(S, W, 1, D, T, T)
    else:
        sig2 = jnp.asarray(2 * Ds * 0.02, jnp.float32)
        le2 = jnp.asarray(0.02 ** 2, jnp.float32)[None, None, None]

        def body(s, eps):
            mu, sig = pallas_refine.refine_pallas(
                xs, lengths, le2, lt0 + eps, sig2, window=W)
            return s + jnp.sum(mu[:, 0]) + jnp.sum(sig[:, 0]), None
        counts = refine_ops(S, W, D, T)

    fn = jax.jit(lambda es: jax.lax.scan(body, 0.0, es)[0])
    e1 = jnp.zeros((1,), jnp.float32)
    e5 = jnp.linspace(0.0, 1e-6, 5).astype(jnp.float32)
    float(fn(e1)), float(fn(e5))
    dt = 1.0 / rate_by_differencing(lambda: fn(e1), lambda: fn(e5), 1, 5)
    slots = fma_equiv(counts, peaks)
    tput = B / dt
    sustained = slots * tput
    return {"name": name, "kind": kind, "S": S, "W": W, "T": T, "B": B,
            "tracks_per_s": round(tput, 1),
            "ops_per_track": {k: round(v) for k, v in counts.items()},
            "fma_equiv_slots_per_track": round(slots),
            "sustained_gops_per_s": round(sustained / 1e9, 1),
            "pct_of_fma_peak": round(100 * sustained / peaks["fma"], 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    dev = jax.devices()[0]
    out = {"device_kind": dev.device_kind, "backend": jax.default_backend()}
    print(f"device: {dev.device_kind}", flush=True)

    peaks, vmem_floor = measure_vpu_peaks(
        n_iter=1024 if args.quick else 4096)
    out["vpu_peaks_gops"] = {k: round(v / 1e9, 1) for k, v in peaks.items()}
    # the fma chain is one dual-issue slot doing 2 flops; the "VPU f32
    # peak" quoted everywhere else in the docs is 2*fma_rate
    out["vpu_fma_peak_gflops"] = round(2 * peaks["fma"] / 1e9, 1)
    out["vmem_roundtrip_floor_gops"] = round(vmem_floor / 1e9, 1)
    out["vmem_bw_gb_s_derived"] = round(vmem_floor * 8 / 1e9, 1)
    print("vpu peaks (Gop/s):", out["vpu_peaks_gops"],
          "| vmem floor:", out["vmem_roundtrip_floor_gops"], flush=True)

    out["hbm_read_gb_s"] = round(measure_hbm_bw(
        0.25 if args.quick else 1.0) / 1e9, 1)
    print("hbm read GB/s:", out["hbm_read_gb_s"], flush=True)

    B = 1 << (19 if args.quick else 20)
    rows = [kernel_row("2state_w6", 2, 6, 1, 10, B, peaks)]
    if not args.quick:
        rows.append(kernel_row("3state_w5", 3, 5, 1, 10, B, peaks))
        rows.append(kernel_row("2state_sub2_w6", 2, 6, 2, 10, B, peaks))
    out["kernels"] = rows
    for r in rows:
        print(json.dumps(r), flush=True)

    # post-fit kernels (VERDICT r4 #4): sustained rate vs the same peaks
    Bp = 1 << (17 if args.quick else 18)
    prows = [postfit_row("predict_2state_w5", "predict", 2, 5, 10, Bp,
                         peaks),
             postfit_row("hist_2state_w7", "hist", 2, 7, 10, Bp, peaks),
             postfit_row("refine_2state_w7", "refine", 2, 7, 10,
                         Bp // 4, peaks)]
    if not args.quick:
        prows.append(postfit_row("refine_3state_w5", "refine", 3, 5, 10,
                                 Bp // 4, peaks))
    out["postfit_kernels"] = prows
    for r in prows:
        print(json.dumps(r), flush=True)

    path = os.path.join(_HERE, "roofline.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
