"""Pallas TPU kernel for the posterior (state-annotation) scan.

The XLA posterior path (core.engine.forward with return_preds=True) carries
the per-slot posterior history ``cat (K, T+W, S, B)`` through HBM every
frame — ~10 multi-hundred-MB materializations per step at production batch
sizes.  This kernel keeps the history resident in VMEM alongside the
sequence register and streams out only the final (T*S, B) posteriors,
mirroring core.engine.forward's return_preds semantics exactly
(reference predict_Bs, extrack/tracking.py:792-906: posteriors of frames
older than the window are harvested from fusion weights, tracking.py:733;
the final window's states come from the register codes, tracking.py:645-649).

The likelihood math is a twin of ops/pallas_engine._kernel (same closing
and look-ahead scheme, so logL parity carries over); the additions are:

  * ``cat`` scratch (K, (T+W)*S, BLK): slot k's posterior over the state of
    each dropped frame, time slot t+1 <-> frame t+1-W,
  * per-step mixing with the fusion weights (the o-softmax is independent
    of the branch pattern a, so the fusion's own w/inv_sw are reused) and
    an iota-masked write of the weights at the dropped frame's slot,
  * on steps where a track ends: pbar = softmax(fin) over the register,
    history reduce + window one-hot -> that track's (T*S,) posteriors.

Scope: nb_substeps == 1 (as the reference's predict_Bs, tracking.py:839),
constant dt, float32.  Drivers fall back to the XLA engine otherwise.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from extrack_tpu.core.tables import ModelTables
from extrack_tpu.core.engine import make_register_spec
from extrack_tpu.ops.pallas_engine import (VMEM_LIMIT, _expand_rows,
                                            classify_sig2,
                                           _sig2_stream, build_next_tables,
                                           build_slot_tables)

_TINY = 1e-30

_SCRATCH_BUDGET = 40 * 1024 * 1024


def predict_block_cap(T: int, W: int, D: int, K: int, S: int) -> int:
    """Largest lane-multiple block whose register + history + posterior
    work set fits the VMEM budget.

    Sized with the kernel's real 8-padded row counts (TPS for the cat
    scratch/temporaries, OHP for the one-hot matmul operand) — an
    unpadded estimate under-counts by up to 7 rows per K-sized tile, the
    defect class that let hist_block_cap admit VMEM-overflowing blocks."""
    tps = -(-((T + W) * S) // 8) * 8
    ohp = -(-(W * S) // 8) * 8
    # register (2D+1 rows of K) + cat + ~4 cat-sized temporaries + history
    per_lane = ((2 * D + 1) * K + 5 * K * tps + 2 * tps + ohp) * 4
    return (_SCRATCH_BUDGET // per_lane) // 128 * 128


def _kernel(xs_ref, l2_ref, len_ref, isbl_ref, lp0_ref, s20_ref, ltv_ref,
            lsv_ref, endv_ref, s2v_ref, ltn_ref, s2n_ref, lsn_ref, endn_ref,
            onehot_ref, logl_ref, preds_ref, m_sc, s2_sc, lp_sc, cat_sc,
            *, T, W, D, K, A, G, S, BLK, min_len, per_step=False):
    lengths = len_ref[0, :]                      # (BLK,) int32
    isbl = isbl_ref[0, :][None, :]               # (1, BLK)
    # history rows padded to the 8-sublane tile: the leading-axis reduce in
    # harvest and the (G*TPS, BLK) merges need 8-aligned inner row counts
    TPS = -(-((T + W) * S) // 8) * 8
    OHP = -(-(W * S) // 8) * 8
    P = S * S                                    # nb_substeps == 1
    QP = K // P

    def s2_slot_table(t):
        # (K, BLK) displacement variance of step t, in slot encoding
        return _expand_rows(lambda p: s2v_ref[pl.ds(t * P + p, 1), :],
                            P, QP, BLK)

    for d in range(D):
        m_sc[d] = jnp.broadcast_to(xs_ref[pl.ds(d, 1), :], (K, BLK))
        if per_step:
            s2_sc[d] = l2_ref[pl.ds(d, 1), :] + s2_slot_table(0)
        else:
            s2_sc[d] = l2_ref[pl.ds(d, 1), :] + s20_ref[:]
    lp_sc[:] = jnp.broadcast_to(lp0_ref[:], (K, BLK))
    cat_sc[:] = jnp.zeros((K, TPS, BLK), jnp.float32)
    preds_ref[:] = jnp.zeros((T * S, BLK), jnp.float32)

    # loop-invariant closing/harvest predicates: scalar length bounds
    # replace per-step vector compare+reduces (exact for sorted
    # same-length blocks; a spurious fire is fully masked)
    any2 = jnp.any(lengths == 2)
    lmax = jnp.max(lengths)
    lminp = jnp.min(jnp.where(lengths > 0, lengths, T + 2))

    def body(t, acc):
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
        # fin = lp + isbl*endv + lc is consumed only by the two gated
        # branches below — computing it there skips two (K, BLK) adds on
        # every non-firing step

        # closing logL for 2-frame tracks (identical to pallas_engine)
        def close_l2(_):
            fin = lp + isbl * endv_ref[:] + lc           # (K, BLK)
            mx = jnp.max(fin, axis=0, keepdims=True)
            lse = mx + jnp.log(jnp.sum(jnp.exp(fin - mx), axis=0,
                                       keepdims=True))
            return jnp.where(((t == lengths - 1)
                              & (lengths == 2))[None, :], lse, 0.0)

        acc = acc + jax.lax.cond(
            (t == 1) & any2, close_l2,
            lambda _: jnp.zeros((1, BLK), jnp.float32), None)

        gate = jnp.where(t + 1 >= min_len, 1.0, 0.0).astype(jnp.float32)

        # look-ahead closing logL (identical to pallas_engine)
        def close_lookahead(_):
            tn = jnp.minimum(t + 1, T - 1)
            tc = jnp.minimum(t, T - 2)
            base_n = lp + lc
            gs, rs = [], []
            mx_n = jnp.full((1, BLK), -jnp.inf, jnp.float32)
            for a in range(A):
                if per_step:
                    # child pair = (pattern a, parent newest state)
                    s2n_a = _expand_rows(
                        lambda s: s2v_ref[pl.ds(tc * P + a * S + s, 1), :],
                        S, K // S, BLK)
                prod_n = jnp.ones((K, BLK), jnp.float32)
                quad_n = jnp.zeros((K, BLK), jnp.float32)
                for d in range(D):
                    xn = xs_ref[pl.ds(tn * D + d, 1), :]
                    l2n = l2_ref[pl.ds(tn * D + d, 1), :]
                    totn = (s2n_a if per_step
                            else s2n_ref[:, a:a + 1]) + tail[d] + l2n
                    diffn = xn - new_m[d]
                    prod_n *= 2 * np.pi * totn
                    quad_n += 0.5 * diffn * diffn / totn
                g = (base_n + ltn_ref[:, a:a + 1]
                     + gate * lsn_ref[:, a:a + 1]
                     + isbl * endn_ref[:, a:a + 1] - quad_n)
                gs.append(g)
                rs.append(jax.lax.rsqrt(prod_n))
                mx_n = jnp.maximum(mx_n, jnp.max(g, axis=0, keepdims=True))
            sum_n = jnp.zeros((1, BLK), jnp.float32)
            for g, r in zip(gs, rs):
                sum_n += jnp.sum(jnp.exp(g - mx_n) * r, axis=0,
                                 keepdims=True)
            lse_n = mx_n + jnp.log(sum_n)
            return jnp.where((t == lengths - 2)[None, :], lse_n, 0.0)

        acc = acc + jax.lax.cond(
            (t >= lminp - 2) & (t <= lmax - 2), close_lookahead,
            lambda _: jnp.zeros((1, BLK), jnp.float32), None)

        # ---- fusion weights over the oldest digit (slot k = g*A + o) -----
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
        wn = [w[o] * inv_sw for o in range(A)]            # (G, BLK) each

        # ---- posterior history update ------------------------------------
        # mixed[g] = sum_o wn[o][g] * cat[g*A + o]; children tile A times;
        # the dropped frame's slot (t+1) gets the fusion weights themselves
        # (cat row (t+1)*S + s of child a*G+g is wn[s][g], a-independent)
        keep = (t < lengths - 1)[None, :]
        catv = cat_sc[:].reshape(G, A, TPS, BLK)
        mixed = wn[0][:, None, :] * catv[:, 0]
        for o in range(1, A):
            mixed = mixed + wn[o][:, None, :] * catv[:, o]   # (G, TPS, BLK)
        row = jax.lax.broadcasted_iota(jnp.int32, (TPS, 1), 0)[None]
        for s in range(S):
            mixed = jnp.where(row == (t + 1) * S + s,
                              wn[s][:, None, :], mixed)
        cat_new = pltpu.repeat(mixed.reshape(G * TPS, BLK), A, axis=0
                               ).reshape(K, TPS, BLK)
        cat_old = cat_sc[:]
        # store BEFORE the harvest: the repeat/reshape chain leaves the
        # value with an implicit-dim layout Mosaic can't feed into the 3D
        # leading-axis reduce below; the scratch round-trip normalizes it
        cat_sc[:] = jnp.where(keep[None], cat_new, cat_old)

        # ---- posteriors of tracks ending at this frame -------------------
        def harvest(_):
            fin = lp + isbl * endv_ref[:] + lc           # (K, BLK)
            mxf = jnp.max(fin, axis=0, keepdims=True)
            e = jnp.exp(fin - mxf)
            pbar = e / jnp.maximum(jnp.sum(e, axis=0, keepdims=True),
                                   _TINY)                 # (K, BLK)
            # broadcast-multiply + leading-axis reduce (K unrolls explode
            # Mosaic compile time); the window part is one MXU matmul
            hist = jnp.sum(cat_sc[:] * pbar[:, None, :], axis=0)
            wpost = jnp.dot(onehot_ref[:], pbar,
                            preferred_element_type=jnp.float32)  # (OHP, BLK)
            # overwrite the last W frames' slots (t+1 .. t+W) with wpost
            rows = jax.lax.broadcasted_iota(jnp.int32, (TPS, 1), 0)
            base = (t + 1) * S  # dynamic scalar; rows compare per-row
            for r in range(W * S):
                hist = jnp.where(rows == base + r, wpost[r:r + 1], hist)
            ending = (t == lengths - 1)[None, :]
            return jnp.where(ending, hist[W * S:(W + T) * S], 0.0)

        preds_ref[:] += jax.lax.cond(
            (t >= lminp - 1) & (t <= lmax - 1), harvest,
            lambda _: jnp.zeros((T * S, BLK), jnp.float32), None)

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
        return acc

    # dynamic trip count: the harvest at t = lmax - 1 is the last useful
    # step; shorter/padded blocks skip the dead tail of the scan
    acc = jax.lax.fori_loop(1, jnp.maximum(lmax, 2), body,
                            jnp.zeros((1, BLK), jnp.float32))
    logl_ref[:] = acc


@functools.partial(
    jax.jit,
    static_argnames=("window", "min_len", "block", "interpret"))
def predict_pallas(positions,
                   lengths,
                   is_bleached,
                   tables: ModelTables,
                   *,
                   window: int = 5,
                   min_len: int = 3,
                   block: int = 512,
                   interpret: bool = False):
    """(logL (B,), preds (B, T, S)) — VMEM-resident posterior kernel.

    Same semantics as core.engine.forward(..., return_preds=True); float32,
    nb_substeps=1.  Per-peak LocErr rides the streamed ``l2`` table;
    per-step / per-track dt streams the displacement-variance table
    exactly as in ops.pallas_engine.
    """
    B, T, D = positions.shape
    S = tables.nb_states
    W = window
    K, A = S ** W, S
    G = K // A
    P = S * S
    sig2 = tables.sig2
    per_step = classify_sig2(sig2, T)

    f32 = jnp.float32
    lp0, s20, lt, lsurv, end, sig2v = [
        v.astype(f32)[:, None]
        for v in build_slot_tables(tables, W, 1)]
    ltn, s2n, lsn, endn = [v.astype(f32)
                           for v in build_next_tables(tables, W, 1)]
    spec = make_register_spec(S, W, 1)
    onehot = np.transpose(
        (spec.codes[:, ::-1, None] == np.arange(S)).astype(np.float32),
        (1, 2, 0)).reshape(W * S, K)              # row w*S+s, col k
    OHP = -(-(W * S) // 8) * 8                    # 8-aligned matmul rows
    onehot = np.pad(onehot, ((0, OHP - W * S), (0, 0)))

    cap = predict_block_cap(T, W, D, K, S)
    if cap < 128:
        raise NotImplementedError(
            f"posterior history for T={T}, K={K} exceeds the VMEM budget — "
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

    kernel = functools.partial(_kernel, T=T, W=W, D=D, K=K, A=A, G=G, S=S,
                               BLK=BLK, min_len=min_len, per_step=per_step)
    grid = (Bp // BLK,)
    track_spec = pl.BlockSpec((T * D, BLK), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((K, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((K, A), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    oh_spec = pl.BlockSpec((OHP, K), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    preds_spec = pl.BlockSpec((T * S, BLK), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    if per_step:
        sig2v, s2v_spec = _sig2_stream(sig2, T, P, B, Bp, BLK, f32)
    else:
        s2v_spec = vec_spec
    logl, preds = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[track_spec, track_spec, row_spec, row_spec,
                  vec_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                  s2v_spec, mat_spec, mat_spec, mat_spec, mat_spec,
                  oh_spec],
        out_specs=[row_spec, preds_spec],
        out_shape=[jax.ShapeDtypeStruct((1, Bp), f32),
                   jax.ShapeDtypeStruct((T * S, Bp), f32)],
        scratch_shapes=[pltpu.VMEM((D, K, BLK), f32),
                        pltpu.VMEM((D, K, BLK), f32),
                        pltpu.VMEM((K, BLK), f32),
                        pltpu.VMEM((K, -(-((T + W) * S) // 8) * 8, BLK),
                                   f32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xs, l2, lengths, isbl, lp0, s20, lt, lsurv, end, sig2v,
      ltn, s2n, lsn, endn, jnp.asarray(onehot))
    return (logl[0, :B],
            preds.reshape(T, S, Bp).transpose(2, 0, 1)[:B])
