"""Pallas TPU kernel for the window-DP duration-histogram scan.

VMEM-resident version of histograms.window_segment_histogram (itself the
TPU-first redesign of the reference P_segment_len,
extrack/histograms.py:26-284): the sequence register is augmented with a
per-slot distribution over the length of the run containing the window's
oldest frame (``run``) and a per-slot expected histogram of segments
completed in the dropped history (``histc``), both transported through the
same fusions as the Gaussian moments.  The XLA scan materializes those
(K, T, B) / (K, S*T, B) carries to HBM every frame; here they live in VMEM
scratch next to the register and only a per-lane (S*T,) accumulator
streams out.

Static per-slot structure (the window states are known at compile time) is
baked in at trace time: boundary-run shifts group by shift amount (one
shifted copy of the run tensor per distinct ``ext`` value), the oldest
state's one-hot and the run-extension mask enter as (K,.) constant inputs,
and completed-in-window segment tables as (rows, K) matrices reduced
against softmax(register) like the posterior kernel's one-hot.

Scope: nb_substeps == 1, constant dt, float32; len_hist falls back to the
XLA engine otherwise.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from extrack_tpu.core.engine import make_register_spec
from extrack_tpu.core.tables import ModelTables
from extrack_tpu.ops.pallas_engine import (VMEM_LIMIT, _expand_rows,
                                            classify_sig2,
                                           _sig2_stream, build_slot_tables)

_TINY = 1e-30

_SCRATCH_BUDGET = 48 * 1024 * 1024


def hist_block_cap(T: int, D: int, K: int, S: int) -> int:
    """Largest lane-multiple block whose register + run/hist carries + the
    transport temporaries fit the VMEM budget.

    The kernel pads bin rows to the 8-sublane tile (TP), and the harvest
    materializes ~4 (K, S*TP)-sized temporaries on top of the declared
    scratch — measured 106 KB/lane at T=10, K=128, S=2, where a 640-lane
    block (the old T-based formula's cap) exceeded the 64 MB scoped-vmem
    limit at compile.  This formula overestimates that measurement by
    ~11%, so the 48 MB budget keeps real usage under ~54 MB.
    """
    TP = -(-T // 8) * 8
    per_lane = ((2 * D + 1) * K + 4 * K * TP + 5 * K * S * TP
                + 2 * S * TP) * 4
    return (_SCRATCH_BUDGET // per_lane) // 128 * 128


def _kernel(xs_ref, l2_ref, len_ref, isbl_ref, lp0_ref, s20_ref, ltv_ref,
            lsv_ref, endv_ref, s2v_ref, eold_ref, extok_ref, extsel_ref,
            segint_ref, segall_ref, out_ref, m_sc, s2_sc, lp_sc, run_sc,
            hist_sc, *, T, TP, W, D, K, A, G, S, BLK, min_len,
            distinct_ext, per_step=False):
    """``distinct_ext``: static tuple of the distinct oldest-run lengths.
    ``eold_ref`` (K, S) one-hot of the oldest state, ``extok_ref`` (K, 1)
    1.0 where the next frame extends the oldest run, ``extsel_ref``
    (K, E) one-hot over distinct_ext, ``segint_ref`` (K*S*TP, 1) completed-
    interior segments per slot, ``segall_ref`` ((W+1)*K*S*TP, 1) all-window
    segments per coverage v."""
    lengths = len_ref[0, :]
    isbl = isbl_ref[0, :][None, :]
    # TP = T rounded up to the 8-sublane tile: reshapes that merge a dim
    # into the sublane axis are layout-preserving only when the inner row
    # count is a tile multiple (Mosaic rejects the shape cast otherwise)
    ST = S * TP
    P = S * S                                    # nb_substeps == 1

    def s2_slot_table(t):
        # (K, BLK) displacement variance of step t, in slot encoding
        return _expand_rows(lambda p: s2v_ref[pl.ds(t * P + p, 1), :],
                            P, K // P, BLK)

    for d in range(D):
        m_sc[d] = jnp.broadcast_to(xs_ref[pl.ds(d, 1), :], (K, BLK))
        if per_step:
            s2_sc[d] = l2_ref[pl.ds(d, 1), :] + s2_slot_table(0)
        else:
            s2_sc[d] = l2_ref[pl.ds(d, 1), :] + s20_ref[:]
    lp_sc[:] = jnp.broadcast_to(lp0_ref[:], (K, BLK))
    row_t = jax.lax.broadcasted_iota(jnp.int32, (TP, 1), 0)[None]
    unit0 = jnp.where(row_t == 0,
                      jnp.ones((K, TP, BLK), jnp.float32), 0.0)
    run_sc[:] = unit0
    hist_sc[:] = jnp.zeros((K, ST, BLK), jnp.float32)
    out_ref[:] = jnp.zeros((ST, BLK), jnp.float32)

    # loop-invariant harvest predicate: scalar length bounds replace the
    # per-step vector compare+reduce (a spurious fire is fully masked)
    lmax = jnp.max(lengths)
    lminp = jnp.min(jnp.where(lengths > 0, lengths, T + 2))

    def body(t, _):
        lp = lp_sc[:]
        prod = jnp.ones((K, BLK), jnp.float32)
        quad = jnp.zeros((K, BLK), jnp.float32)
        new_m = [None] * D
        tail = [None] * D
        for d in range(D):
            x = xs_ref[pl.ds(t * D + d, 1), :]
            l2t = l2_ref[pl.ds(t * D + d, 1), :]
            md, s2d = m_sc[d], s2_sc[d]
            tot = l2t + s2d
            inv = 1.0 / tot
            diff = x - md
            prod *= 2 * np.pi * tot
            quad += 0.5 * diff * diff * inv
            new_m[d] = (md * l2t + x * s2d) * inv
            tail[d] = l2t * s2d * inv
        lc = -0.5 * jnp.log(prod) - quad

        run = run_sc[:]                                   # (K, T, BLK)
        histc = hist_sc[:]                                # (K, ST, BLK)

        # ---- harvest tracks ending at this frame -------------------------
        def harvest(_):
            # fin only matters when the cond fires: two (K, BLK) adds
            # saved on every other step
            fin = lp + isbl * endv_ref[:] + lc
            mxf = jnp.max(fin, axis=0, keepdims=True)
            e = jnp.exp(fin - mxf)
            pbar = e / jnp.maximum(jnp.sum(e, axis=0, keepdims=True),
                                   _TINY)                 # (K, BLK)
            # boundary run: carried bins shifted by ext-1 into the oldest
            # state's rows; one shifted run copy per distinct ext value
            bnd = jnp.zeros((K, TP, BLK), jnp.float32)
            for i, ev in enumerate(distinct_ext):
                sh = ev - 1
                shifted = run if sh == 0 else jnp.concatenate(
                    [jnp.zeros((K, sh, BLK), jnp.float32),
                     run[:, :TP - sh]], axis=1)
                bnd = bnd + extsel_ref[:, i:i + 1][:, :, None] * shifted
            # scatter into the oldest state's row block: concat over s of
            # per-state masked copies ((K,S) -> (K,S,1,1) expansions move
            # the lane dim and Mosaic rejects the shape cast)
            bnd_full = jnp.concatenate(
                [bnd * eold_ref[:, s:s + 1][:, :, None] for s in range(S)],
                axis=1)                                   # (K, ST, BLK)
            carry_mode = (t + 1 > W)
            total = histc + jnp.where(carry_mode, bnd_full, 0.0)
            # completed-in-window statics, stored as (K*ST, 1) columns so
            # the coverage-v block is one 8-aligned dynamic slice and the
            # posterior reduce is a broadcast-multiply + leading-axis sum
            # (an unrolled K loop made the Mosaic program huge: ~15 min
            # compiles at K=128)
            v = jnp.minimum(t + 1, W)
            seg_v = segall_ref[pl.ds(v * K * ST, K * ST), :]
            seg3 = jnp.where(carry_mode, segint_ref[:],
                             seg_v).reshape(K, ST, 1)
            acc = jnp.sum((total + seg3) * pbar[:, None, :], axis=0)
            ending = (t == lengths - 1)[None, :]
            return jnp.where(ending, acc, 0.0)

        out_ref[:] += jax.lax.cond(
            (t >= lminp - 1) & (t <= lmax - 1), harvest,
            lambda _: jnp.zeros((ST, BLK), jnp.float32), None)

        # ---- fusion weights over the oldest digit ------------------------
        gate = jnp.where(t + 1 >= min_len, 1.0, 0.0).astype(jnp.float32)
        score3 = (lp + lc).reshape(G, A, BLK)
        mxs = score3[:, 0]
        for o in range(1, A):
            mxs = jnp.maximum(mxs, score3[:, o])
        w = [jnp.exp(score3[:, o] - mxs) for o in range(A)]
        sw = w[0]
        for o in range(1, A):
            sw = sw + w[o]
        inv_sw = 1.0 / jnp.maximum(sw, _TINY)
        lp_f = mxs + jnp.log(jnp.maximum(sw, _TINY))
        wn = [w[o] * inv_sw for o in range(A)]

        # ---- run / hist transport across the drop ------------------------
        keep = (t < lengths - 1)[None, :]
        real_drop = t >= W - 1
        shifted = jnp.concatenate(
            [jnp.zeros((K, 1, BLK), jnp.float32), run[:, :TP - 1]],
            axis=1)
        extok = extok_ref[:][:, :, None]                  # (K, 1, 1)
        sel = jnp.where(real_drop,
                        extok * shifted + (1.0 - extok) * unit0,
                        run)
        selv = sel.reshape(G, A, TP, BLK)
        run_new = wn[0][:, None, :] * selv[:, 0]
        for o in range(1, A):
            run_new = run_new + wn[o][:, None, :] * selv[:, o]
        run_after = jnp.where(
            keep[None], pltpu.repeat(run_new.reshape(G * TP, BLK), A,
                                     axis=0).reshape(K, TP, BLK), run)

        cmp = (1.0 - extok) * run                         # (K, TP, BLK)
        completed = jnp.where(
            real_drop,
            jnp.concatenate(
                [cmp * eold_ref[:, s:s + 1][:, :, None] for s in range(S)],
                axis=1),
            0.0)                                          # (K, ST, BLK)
        histv = (histc + completed).reshape(G, A, ST, BLK)
        hist_new = wn[0][:, None, :] * histv[:, 0]
        for o in range(1, A):
            hist_new = hist_new + wn[o][:, None, :] * histv[:, o]
        hist_after = jnp.where(
            keep[None], pltpu.repeat(hist_new.reshape(G * ST, BLK), A,
                                     axis=0).reshape(K, ST, BLK), histc)
        run_sc[:] = run_after
        hist_sc[:] = hist_after

        # ---- register update (same math as pallas_engine) ----------------
        s2_add = (s2_slot_table(jnp.minimum(t, T - 2)) if per_step
                  else s2v_ref[:])
        for d in range(D):
            nm3 = new_m[d].reshape(G, A, BLK)
            tl3 = tail[d].reshape(G, A, BLK)
            m_f = wn[0] * nm3[:, 0]
            t_f = wn[0] * tl3[:, 0]
            for o in range(1, A):
                m_f += wn[o] * nm3[:, o]
                t_f += wn[o] * tl3[:, o]
            m_sc[d] = jnp.where(keep, pltpu.repeat(m_f, A, axis=0), m_sc[d])
            s2_sc[d] = jnp.where(keep,
                                 s2_add + pltpu.repeat(t_f, A, axis=0),
                                 s2_sc[d])
        lp_new = (pltpu.repeat(lp_f, A, axis=0) + ltv_ref[:]
                  + gate * lsv_ref[:])
        lp_sc[:] = jnp.where(keep, lp_new, lp)
        return 0

    # dynamic trip count: the harvest at t = lmax - 1 is the last useful
    # step; shorter/padded blocks skip the dead tail of the scan
    jax.lax.fori_loop(1, jnp.maximum(lmax, 2), body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("window", "min_len", "block", "interpret"))
def hist_pallas(positions,
                lengths,
                is_bleached,
                tables: ModelTables,
                *,
                window: int = 7,
                min_len: int = 3,
                block: int = 256,
                interpret: bool = False):
    """(T, S) posterior-expected segment-length histogram — VMEM-resident
    kernel.  Same semantics as histograms.window_segment_histogram with
    nb_substeps=1, float32.  Per-peak LocErr rides the streamed ``l2``
    table; per-step / per-track dt streams the displacement-variance
    table exactly as in ops.pallas_engine.
    """
    from extrack_tpu.histograms import _segment_tables

    B, T, D = positions.shape
    S = tables.nb_states
    W = window
    K, A = S ** W, S
    G = K // A
    TP = -(-T // 8) * 8      # bin rows padded to the 8-sublane tile
    ST = S * TP
    P = S * S
    sig2 = tables.sig2
    per_step = classify_sig2(sig2, T)

    f32 = jnp.float32
    lp0, s20, lt, lsurv, end, sig2v = [
        v.astype(f32)[:, None]
        for v in build_slot_tables(tables, W, 1)]
    spec = make_register_spec(S, W, 1)
    seg_int_np, seg_all_np, ext_np = _segment_tables(spec.codes, W, T, S,
                                                     stride=1)
    # (K*S*TP, 1) column layouts (row k*ST + s*TP + m): the kernel
    # reshapes to (K, ST, 1) and reduces against softmax(register) with a
    # broadcast multiply; bins T..TP-1 are padding
    seg_int_p = np.zeros((K, S, TP), np.float32)
    seg_int_p[:, :, :T] = seg_int_np.transpose(0, 2, 1)
    seg_int = jnp.asarray(seg_int_p.reshape(K * ST, 1))
    seg_all_p = np.zeros((W + 1, K, S, TP), np.float32)
    seg_all_p[:, :, :, :T] = seg_all_np.transpose(0, 1, 3, 2)
    seg_all = jnp.asarray(seg_all_p.reshape((W + 1) * K * ST, 1))
    e_old = jnp.asarray(
        (spec.codes[:, W - 1, None] == np.arange(S)).astype(np.float32))
    ext_ok = jnp.asarray(
        (spec.codes[:, W - 2] == spec.codes[:, W - 1]
         ).astype(np.float32))[:, None]
    distinct_ext = tuple(sorted(set(int(e) for e in ext_np)))
    ext_sel = jnp.asarray(
        (ext_np[:, None] == np.asarray(distinct_ext)[None, :]
         ).astype(np.float32))                            # (K, E)

    cap = hist_block_cap(T, D, K, S)
    if cap < 128:
        raise NotImplementedError(
            f"run/hist carries for T={T}, K={K} exceed the VMEM budget — "
            "use the XLA engine")
    BLK = min(block, cap, max(128, 1 << (B - 1).bit_length()))
    Bp = int(np.ceil(B / BLK)) * BLK
    l2 = jnp.broadcast_to(tables.loc_err2.astype(f32), (B, T, D))
    xs = positions.astype(f32).transpose(1, 2, 0).reshape(T * D, B)
    l2 = l2.transpose(1, 2, 0).reshape(T * D, B)
    if Bp != B:
        xs = jnp.pad(xs, ((0, 0), (0, Bp - B)))
        l2 = jnp.pad(l2, ((0, 0), (0, Bp - B)), constant_values=1.0)
        lengths = jnp.pad(lengths, (0, Bp - B))
        is_bleached = jnp.pad(is_bleached, (0, Bp - B))
    lengths = lengths.astype(jnp.int32)[None, :]
    isbl = is_bleached.astype(f32)[None, :]

    kernel = functools.partial(_kernel, T=T, TP=TP, W=W, D=D, K=K, A=A,
                               G=G, S=S,
                               BLK=BLK, min_len=min_len,
                               distinct_ext=distinct_ext, per_step=per_step)
    grid = (Bp // BLK,)
    track_spec = pl.BlockSpec((T * D, BLK), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((K, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    eold_spec = pl.BlockSpec((K, S), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    extsel_spec = pl.BlockSpec((K, len(distinct_ext)), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    segint_spec = pl.BlockSpec((K * ST, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    segall_spec = pl.BlockSpec(((W + 1) * K * ST, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ST, BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    if per_step:
        sig2v, s2v_spec = _sig2_stream(sig2, T, P, B, Bp, BLK, f32)
    else:
        s2v_spec = vec_spec
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[track_spec, track_spec, row_spec, row_spec,
                  vec_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                  s2v_spec, eold_spec, vec_spec, extsel_spec,
                  segint_spec, segall_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((ST, Bp), f32),
        scratch_shapes=[pltpu.VMEM((D, K, BLK), f32),
                        pltpu.VMEM((D, K, BLK), f32),
                        pltpu.VMEM((K, BLK), f32),
                        pltpu.VMEM((K, TP, BLK), f32),
                        pltpu.VMEM((K, ST, BLK), f32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xs, l2, lengths, isbl, lp0, s20, lt, lsurv, end, sig2v,
      e_old, ext_ok, ext_sel, seg_int, seg_all)
    return jnp.sum(out, axis=1).reshape(S, TP)[:, :T].T
