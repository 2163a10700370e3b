"""Pallas TPU kernel for likelihood *gradients* (custom VJP).

The XLA reverse pass of the scan engine re-materializes per-step carries and
intermediates through HBM; this kernel runs the whole forward recursion with
per-step carries checkpointed in VMEM, then walks the steps backwards
applying per-step pullbacks (``jax.vjp`` of the pure step function, traced
inside the kernel) — HBM traffic is the inputs plus one cotangent array.

Exposed as ``neg_log_likelihood`` with a ``jax.custom_vjp``: differentiable
inputs are the per-slot table vectors (init prior, displacement variances,
transition chain, survival, end term) and the localization-error variance
array; everything upstream (physical parameters -> tables) is plain XLA, so
``jax.grad`` of a fit objective composes through unchanged.

Scope: float32; constant, per-step, and per-track dt (same envelope as
ops/pallas_engine — variable dt streams the displacement-variance table,
whose cotangent the backward pass accumulates row-wise); the fit driver
falls back to the XLA engine outside it.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from extrack_tpu.core.tables import ModelTables
from extrack_tpu.ops.pallas_engine import (VMEM_LIMIT, _class_runs,
                                           _rexpand, _rfold,
                                           _sig2_stream,
                                           build_next_tables,
                                           build_slot_tables,
                                           classify_sig2, storage_order)

_TINY = 1e-30


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def _tile(x, A):
    """Differentiable tile along the sublane axis ([x; x; ...] A times).

    Lowers to ``pltpu.repeat`` (the same native tile pallas_engine uses —
    a sublane-tile copy, cheaper than the generic concat) with a custom
    JVP so the HVP kernel's jax.jvp over ``interior`` still composes
    (repeat is linear: the tangent just tiles too)."""
    return x if A == 1 else pltpu.repeat(x, A, axis=0)


@_tile.defjvp
def _tile_jvp(A, primals, tangents):
    (x,), (xd,) = primals, tangents
    return _tile(x, A), _tile(xd, A)

# module-level switch for interpreter-mode testing on CPU
INTERPRET = False

# how the backward walk's G-row interleave pins its layout (measured on
# TPU via benchmarks/grad_bench.py; see interleave_g in _make_step):
# "scratch" = store+read laundering round trip, "barrier" =
# lax.optimization_barrier, "none" = use the reshape-merged value as-is
INTERLEAVE_MODE = "scratch"


# storage_order/_class_runs/_rfold/_rexpand live in pallas_engine (the
# forward kernel shares the o-major layout); re-exported here for the
# HVP kernel and external callers.


def _make_step(D, K, A, G, min_len, S=0, P=0):
    """Per-frame update pieces shared by the in-kernel forward and backward.

    carry: (m (D,K,BLK), s2 (D,K,BLK), lp (K,BLK)); acc (1,BLK) is
    accumulated by the closings only.  Mirrors ops/pallas_engine._kernel's
    body exactly.  With S/P > 0 (variable dt) ``sig2_t`` is the (P, BLK)
    displacement-variance rows of step t (pattern p = n+1 newest
    sub-states) and replaces the constant ``s2v``/``s2n`` tables.

    The pieces are separable so the closings can be lax.cond-gated: with
    length-sorted batches each closing fires on one scan step per block,
    and the backward walk can skip their (expensive) pullback replay on
    every other step.  The conds are always PRIMAL — the backward takes
    jax.vjp of each piece separately and gates the closing pullbacks with
    its own cond (differentiating *through* lax.cond lowers to a
    many-result vector scf.if that Mosaic cannot legalize).
    """
    per_step = P > 0
    if A > 1 and G % A:
        raise NotImplementedError(
            f"o-major storage layout needs A | G (window >= 2*nb_substeps)"
            f"; got G={G}, A={A}")
    GA = G // A if A > 1 else G
    if per_step:
        # storage-order run lists for the per-step dt tables: the dt
        # pattern (n+1 newest digits, k // (K/P)) and the parent newest
        # digit (k // (K/S)) are digit prefixes, so they stay contiguous
        # runs within each storage block
        pat_runs = _class_runs(np.arange(K) // (K // P), K, A)
        new_runs = _class_runs(np.arange(K) // (K // S), K, A)

    def tile_storage(v):
        """(G, BLK) fused values -> (K, BLK) children, storage order.

        Child rows of block u are the A repeat-tiled copies of the
        stride-A subsample v[h*A + u] (see storage_order): one
        (G//A, A, BLK) reshape, A middle-axis slices, native repeats,
        one concat — no K-row interleave anywhere."""
        if A == 1:
            return v
        sub = v.reshape(GA, A, -1)
        return jnp.concatenate(
            [_tile(sub[:, u], A) for u in range(A)], axis=0)

    cl2pi = float(0.5 * D * np.log(2 * np.pi))

    def prep(m, s2, lp, x, l2):
        """Gaussian look-ahead update: normalizer product, quadratic form,
        posterior means, variance tails, and total-variance inverses for
        every register slot."""
        prod = jnp.ones(lp.shape, lp.dtype)
        quad = jnp.zeros(lp.shape, lp.dtype)
        new_m, tail, invs = [], [], []
        for d in range(D):
            tot = l2[d] + s2[d]
            rt = jax.lax.rsqrt(tot)
            inv = rt * rt
            diff = x[d] - m[d]
            prod = prod * tot
            quad = quad + 0.5 * diff * diff * inv
            new_m.append((m[d] * l2[d] + x[d] * s2[d]) * inv)
            tail.append(l2[d] * s2[d] * inv)
            invs.append(inv)
        return prod, quad, new_m, tail, invs

    def close_l2(m, s2, lp, x, l2, t, lengths, isbl, endv):
        """2-frame tracks close here; longer tracks close one step early
        on the pre-fusion children (reference's skipped last-step
        fusion)."""
        prod, quad, _, _, _ = prep(m, s2, lp, x, l2)
        lc = -0.5 * jnp.log(prod) - quad - cl2pi
        fin = lp + isbl * endv + lc
        mx = jax.lax.stop_gradient(jnp.max(fin, axis=0, keepdims=True))
        lse = mx + jnp.log(jnp.sum(jnp.exp(fin - mx), axis=0,
                                   keepdims=True))
        return jnp.where(((t == lengths - 1) & (lengths == 2))[None, :],
                         lse, 0.0)

    def close_look(m, s2, lp, x, l2, x_n, l2_n, t, lengths, isbl,
                   ltn, s2n, lsn, endn, sig2_t=None):
        """Look-ahead closing: per-child Gaussian normalizers enter as
        rsqrt factors on the exp side (one log for the whole
        look-ahead)."""
        prod, quad, new_m, tail, _ = prep(m, s2, lp, x, l2)
        lc = -0.5 * jnp.log(prod) - quad - cl2pi
        gate = jnp.where(t + 1 >= min_len, 1.0, 0.0).astype(lp.dtype)
        base_n = lp + lc
        gs, rs = [], []
        mx_n = jnp.full((1, lp.shape[1]), -jnp.inf, lp.dtype)
        for a in range(A):
            if per_step:
                s2n_a = _rexpand(
                    lambda s, a=a: sig2_t[a * S + s:a * S + s + 1],
                    new_runs)
            prod_n = jnp.ones(lp.shape, lp.dtype)
            quad_n = jnp.zeros(lp.shape, lp.dtype)
            for d in range(D):
                totn = (s2n_a if per_step
                        else s2n[:, a:a + 1]) + tail[d] + l2_n[d]
                rn = jax.lax.rsqrt(totn)
                diffn = x_n[d] - new_m[d]
                prod_n = prod_n * (2 * np.pi * totn)
                quad_n = quad_n + 0.5 * diffn * diffn * (rn * rn)
            g = (base_n + ltn[:, a:a + 1] + gate * lsn[:, a:a + 1]
                 + isbl * endn[:, a:a + 1] - quad_n)
            gs.append(g)
            rs.append(jax.lax.rsqrt(prod_n))
            mx_n = jnp.maximum(mx_n, jnp.max(g, axis=0, keepdims=True))
        mx_n = jax.lax.stop_gradient(mx_n)
        sum_n = jnp.zeros((1, lp.shape[1]), lp.dtype)
        for g, r in zip(gs, rs):
            sum_n = sum_n + jnp.sum(jnp.exp(g - mx_n) * r, axis=0,
                                    keepdims=True)
        return jnp.where((t == lengths - 2)[None, :],
                         mx_n + jnp.log(sum_n), 0.0)

    def close_look_bwd(m, s2, lp, x, l2, x_n, l2_n, t, lengths, isbl,
                       ltn, s2n, lsn, endn, sig2_t=None):
        """Hand-derived VJP of ``close_look`` with upstream cotangent 1.

        The traced ``jax.vjp`` replays the primal and then runs a
        mechanically-transposed linear pass (~2x the primal's arith on
        top); this recomputes the same primal pieces once and applies
        the softmax-posterior rule directly: with
        q_a = sel * exp(g_a - mx) * r_a / S (the per-child posterior
        weight of the look-ahead mixture, sel the closing-lane mask),
        every cotangent is a moment of q — ct_g = q, ct_(1/2 log prod_n)
        = -q, pbar = sum_a q_a plays the role interior_bwd's ct_base
        plays for the shared prep chain (lc enters every child
        additively).  Transcendental bill identical to one primal
        evaluation; returns exactly what jax.vjp(close_look)(ones)
        returns, in pull_look's output order."""
        prod, quad, new_m, tail, invs = prep(m, s2, lp, x, l2)
        gate = jnp.where(t + 1 >= min_len, 1.0, 0.0).astype(lp.dtype)
        base_n = (lp - quad) - 0.5 * jnp.log(prod) - cl2pi
        gs, rs, invns, diffns, s2n_rows = [], [], [], [], []
        mx_n = jnp.full((1, lp.shape[1]), -jnp.inf, lp.dtype)
        for a in range(A):
            if per_step:
                s2n_a = _rexpand(
                    lambda s, a=a: sig2_t[a * S + s:a * S + s + 1],
                    new_runs)
                s2n_rows.append(s2n_a)
            prod_n = jnp.ones(lp.shape, lp.dtype)
            quad_n = jnp.zeros(lp.shape, lp.dtype)
            invn_a, diffn_a = [], []
            for d in range(D):
                totn = (s2n_a if per_step
                        else s2n[:, a:a + 1]) + tail[d] + l2_n[d]
                rn = jax.lax.rsqrt(totn)
                invn = rn * rn
                diffn = x_n[d] - new_m[d]
                prod_n = prod_n * (2 * np.pi * totn)
                quad_n = quad_n + 0.5 * diffn * diffn * invn
                invn_a.append(invn)
                diffn_a.append(diffn)
            g = (base_n + ltn[:, a:a + 1] + gate * lsn[:, a:a + 1]
                 + isbl * endn[:, a:a + 1] - quad_n)
            gs.append(g)
            rs.append(jax.lax.rsqrt(prod_n))
            invns.append(invn_a)
            diffns.append(diffn_a)
            mx_n = jnp.maximum(mx_n, jnp.max(g, axis=0, keepdims=True))
        es = [jnp.exp(g - mx_n) * r for g, r in zip(gs, rs)]
        sum_n = jnp.zeros((1, lp.shape[1]), lp.dtype)
        for e in es:
            sum_n = sum_n + jnp.sum(e, axis=0, keepdims=True)
        # S >= min_a r_a > 0 always (mx is the max, so one exp is 1)
        rS = jax.lax.rsqrt(sum_n)
        sel = jnp.where((t == lengths - 2)[None, :], rS * rS, 0.0)
        qs = [e * sel for e in es]

        pbar = qs[0]
        for a in range(1, A):
            pbar = pbar + qs[a]
        d_ltn = jnp.concatenate(
            [jnp.sum(q, axis=1, keepdims=True) for q in qs], axis=1)
        d_lsn = gate * d_ltn
        d_endn = jnp.concatenate(
            [jnp.sum(isbl * q, axis=1, keepdims=True) for q in qs], axis=1)

        # children -> (new_m, tail, l2_n, s2n/sig2) cotangents
        ct_nm = [jnp.zeros(lp.shape, lp.dtype) for _ in range(D)]
        ct_tl = [jnp.zeros(lp.shape, lp.dtype) for _ in range(D)]
        ctn_sum = [None] * A            # sum_d ct_totn_{a,d}, per child
        for a in range(A):
            for d in range(D):
                invn, diffn = invns[a][d], diffns[a][d]
                dn = diffn * invn
                ct_totn = (0.5 * qs[a]) * (diffn * dn - 1.0) * invn
                ct_nm[d] = ct_nm[d] + qs[a] * dn
                ct_tl[d] = ct_tl[d] + ct_totn
                ctn_sum[a] = (ct_totn if ctn_sum[a] is None
                              else ctn_sum[a] + ct_totn)
        d_l2n = jnp.stack([jnp.sum(ct_tl[d], axis=0, keepdims=True)
                           for d in range(D)])
        # careful: ct_tl accumulated BOTH tail's and l2_n's cotangent above
        # (totn = s2n + tail + l2_n is additive in both) — they are equal,
        # so reuse; s2n's is the lane sum of the same per-child totals
        if per_step:
            d_s2n = jnp.zeros((K, A), lp.dtype)
            # per-(pattern a, parent newest s) fold over storage runs
            folds = [_rfold(ctn_sum[a], new_runs, S) for a in range(A)]
            d_sg = jnp.concatenate(
                [folds[p // S][p % S:p % S + 1] for p in range(P)], axis=0)
        else:
            d_s2n = jnp.concatenate(
                [jnp.sum(c, axis=1, keepdims=True) for c in ctn_sum],
                axis=1)

        # shared prep chain, exactly interior_bwd's rule with pbar as the
        # effective base cotangent
        d_m, d_s2, d_l2 = [], [], []
        for d in range(D):
            inv = invs[d]
            diff = x[d] - m[d]
            e = diff * inv
            cn = ct_nm[d] * inv
            ctl = ct_tl[d] * inv
            ct_tot = (0.5 * pbar) * (diff * e - 1.0) * inv \
                - cn * new_m[d] - ctl * tail[d]
            d_m.append(pbar * e + cn * l2[d])
            d_s2.append(ct_tot + cn * x[d] + ctl * l2[d])
            d_l2.append(jnp.sum(ct_tot + cn * m[d] + ctl * s2[d],
                                axis=0, keepdims=True))
        out = ((jnp.stack(d_m), jnp.stack(d_s2), pbar), jnp.stack(d_l2),
               d_l2n, d_ltn, d_s2n, d_lsn, d_endn)
        if per_step:
            return out + (d_sg,)
        return out

    def interior(m, s2, lp, x, l2, t, lengths, ltv, lsv, s2v, sig2_t=None,
                 with_extras=False):
        """Fuse + update: per-step Gaussian normalizers ride as rsqrt
        factors into the fusion's exp-sum (their 2*pi constants are folded
        into ltv by the wrapper) — same log-free scheme as
        pallas_engine._kernel; shift by max(lp - quad) (exp args <= 0,
        rsqrt factors bounded).

        ``with_extras=True`` additionally returns the backward stash
        (invtot (D,K,BLK), wn o-major-concat (K,BLK), ok (G,BLK)): the
        quantities whose recompute would cost the backward walk its
        transcendentals (rsqrt per d, A exps, the max tree, the sw
        division) — the gradient kernel checkpoints them per step and
        ``interior_bwd`` runs division- and exp-free."""
        if per_step:
            s2v = _rexpand(lambda p: sig2_t[p:p + 1], pat_runs)
        prod, quad, new_m, tail, invs = prep(m, s2, lp, x, l2)
        gate = jnp.where(t + 1 >= min_len, 1.0, 0.0).astype(lp.dtype)

        # o-major storage: a fusion group's members sit at the same row
        # of the A contiguous (G, BLK) blocks, so the o-reduce is
        # elementwise over block slices — no (G, A, BLK) reshape, no
        # stride-A sublane gathers (storage_order docstring)
        base = lp - quad
        rq = jax.lax.rsqrt(prod)
        bparts = [base[o * G:(o + 1) * G] for o in range(A)]
        rparts = [rq[o * G:(o + 1) * G] for o in range(A)]
        mxs = bparts[0]
        for o in range(1, A):
            mxs = jnp.maximum(mxs, bparts[o])
        mxs = jax.lax.stop_gradient(mxs)
        w = [jnp.exp(bparts[o] - mxs) * rparts[o] for o in range(A)]
        sw = w[0]
        for o in range(1, A):
            sw = sw + w[o]
        inv_sw = 1.0 / jnp.maximum(sw, _TINY)
        lp_f = mxs + jnp.log(jnp.maximum(sw, _TINY))
        wn = [w[o] * inv_sw for o in range(A)]

        keep = (t < lengths - 1)[None, :]
        m_out, s2_out = [], []
        for d in range(D):
            nmp = [new_m[d][o * G:(o + 1) * G] for o in range(A)]
            tlp = [tail[d][o * G:(o + 1) * G] for o in range(A)]
            m_f = wn[0] * nmp[0]
            t_f = wn[0] * tlp[0]
            for o in range(1, A):
                m_f = m_f + wn[o] * nmp[o]
                t_f = t_f + wn[o] * tlp[o]
            m_out.append(jnp.where(keep, tile_storage(m_f), m[d]))
            s2_out.append(jnp.where(keep,
                                    s2v + tile_storage(t_f),
                                    s2[d]))
        lp_new = tile_storage(lp_f) + ltv + gate * lsv
        lp_out = jnp.where(keep, lp_new, lp)
        carry = (jnp.stack(m_out), jnp.stack(s2_out), lp_out)
        if not with_extras:
            return carry
        ok = jnp.where(sw >= _TINY, 1.0, 0.0).astype(lp.dtype)
        extras = (jnp.stack(invs), jnp.concatenate(wn, axis=0), ok)
        if with_extras == 2:
            # "full" stash: new_m/tail are free here (prep computed them);
            # checkpointing them saves the backward walk its 6K-per-dim
            # rebuild (the walk is compute-bound — block sweep 256/512/640
            # measured 11.01/11.02/10.04M, so the extra VMEM is cheap)
            extras = extras + (jnp.stack(new_m), jnp.stack(tail))
        return carry, extras

    def interior_bwd(m, s2, lp, x, l2, t, lengths, ct_m, ct_s2, ct_lp,
                     invtot, wn_cat, ok, norm_ref=None, nm_stash=None,
                     tl_stash=None):
        """Hand-derived VJP of ``interior``: same cotangents jax.vjp
        produces, minus the mechanical primal replay (the output assembly
        and its masking never enter any derivative).  Returns
        (d_m, d_s2, d_lp), d_l2, d_ltv, d_lsv, d_s2v[, d_sig2_t].

        ltv never enters nonlinearly (lp' = tile(lp_f) + ltv + gate*lsv),
        so its cotangent is just the kept lp cotangent; same for lsv
        (times the scalar gate) and s2v (s2' = s2v + tile).  These three
        come back lane-RESOLVED (K, BLK): per-step lane reduces both cost
        VPU time and produce a (K, 1) layout Mosaic cannot unify with the
        skip-cond's replicated zeros ("invalid relayout" at the carry
        add) — the caller accumulates them wide and reduces once after
        the walk.
        The fusion chain differentiates the normalized-weight average
        m_f = (sum_o w_o nm_o) / sw exactly as the softmax-mixture rule:
        ct_w_o = [ct_lpf + sum_d ct_mf_d (nm_o - m_f) + ct_tf_d
        (tl_o - t_f)] / sw, then w_o = exp(base_o - mx) * rsqrt(prod_o)
        gives ct_base_o = ct_w_o w_o and ct_prod_o = -ct_base_o/(2 prod).
        The max shift and the _TINY floor follow stop_gradient / max-VJP
        semantics (derivative 0 where sw underflows the floor).

        The walk consumes the forward's per-step stash
        (``invtot`` = 1/(l2+s2) per d, ``wn_cat`` = normalized fusion
        weights in o-major concat order, ``ok`` = sw-above-floor mask):
        every transcendental of the naive recompute — D rsqrts, A exps,
        the max tree, the sw division — drops out, because w_o only ever
        appears multiplied by inv_sw (= wn_o, stashed) or ok_inv
        (= wn_o*ok), and ct_prod*prod folds to -ct_base/2.

        The displacement-variance table (s2v / the streamed sig2_t row)
        enters ``interior`` only additively (s2' = s2v + tile(t_f)), so
        its cotangent needs no table values: the constant-dt (K, 1)
        cotangent is the lane sum of the kept s2 cotangents, the
        per-step (P, BLK) one their per-pattern sublane fold."""
        gate = jnp.where(t + 1 >= min_len, 1.0, 0.0).astype(lp.dtype)
        keep = jnp.where((t < lengths - 1)[None, :], 1.0,
                         0.0).astype(lp.dtype)
        drop = 1.0 - keep

        # stash-fed recompute: invtot/wn/ok checkpointed by the forward
        # make this walk free of rsqrt, exp, max trees and divisions —
        # and with the full stash (grad kernel) new_m/tail arrive
        # checkpointed too; the rebuild-from-invtot path remains for the
        # HVP kernel, which stashes only the first-order triple
        if nm_stash is None:
            new_m = [(m[d] * l2[d] + x[d] * s2[d]) * invtot[d]
                     for d in range(D)]
            tail = [l2[d] * s2[d] * invtot[d] for d in range(D)]
        else:
            new_m = [nm_stash[d] for d in range(D)]
            tail = [tl_stash[d] for d in range(D)]
        # o-major storage: every per-o quantity is a contiguous (G, BLK)
        # block slice (storage_order docstring) — the walk has no
        # (G, A, ·) reshapes, no stride-A gathers, and no K-row
        # interleave scatters
        wn = [wn_cat[o * G:(o + 1) * G] for o in range(A)]
        nmo = [[new_m[d][o * G:(o + 1) * G] for o in range(A)]
               for d in range(D)]
        tlo = [[tail[d][o * G:(o + 1) * G] for o in range(A)]
               for d in range(D)]
        m_f, t_f = [None] * D, [None] * D
        for d in range(D):
            mf = wn[0] * nmo[d][0]
            tf = wn[0] * tlo[d][0]
            for o in range(1, A):
                mf = mf + wn[o] * nmo[d][o]
                tf = tf + wn[o] * tlo[d][o]
            m_f[d], t_f[d] = mf, tf

        ctk_lp = keep * ct_lp
        ctk_m = [keep * ct_m[d] for d in range(D)]
        ctk_s2 = [keep * ct_s2[d] for d in range(D)]

        # untile (transpose of tile_storage): ct w.r.t. the fused value
        # v[g] = sum over children a of ct[(g % A)*G + a*GA + g // A] —
        # per block u, sum the A contiguous (GA, BLK) chunks, leaving the
        # fused-space cotangent stride-A SUBSAMPLED by u = g % A; the
        # G-row interleave below is the only interleave left in the walk
        # (A x (GA, BLK) -> (G, BLK), scratch-laundered: the
        # reshape-merged value carries an implicit-dim layout Mosaic
        # refuses to relayout downstream — dev-notes rule)
        def untile(c):
            parts = []
            for u in range(A):
                s = c[u * G:u * G + GA]
                for a in range(1, A):
                    s = s + c[u * G + a * GA:u * G + (a + 1) * GA]
                parts.append(s)
            return parts

        def interleave_g(parts, slot):
            if A == 1:
                return parts[0]
            v = jnp.concatenate([p[:, None] for p in parts],
                                axis=1).reshape(G, -1)
            if norm_ref is None or INTERLEAVE_MODE == "none":
                return v
            if INTERLEAVE_MODE == "barrier":
                return jax.lax.optimization_barrier(v)
            norm_ref[pl.ds(slot, 1)] = v[None]
            return norm_ref[pl.ds(slot, 1)][0]

        ct_lpf = interleave_g(untile(ctk_lp), 0)
        ct_mf = [interleave_g(untile(ctk_m[d]), 1 + 2 * d)
                 for d in range(D)]
        ct_tf = [interleave_g(untile(ctk_s2[d]), 2 + 2 * d)
                 for d in range(D)]

        # table cotangents (linear paths), lane-resolved
        d_ltv = ctk_lp
        d_lsv = gate * ctk_lp
        sum_ct_s2 = ctk_s2[0]
        for d in range(1, D):
            sum_ct_s2 = sum_ct_s2 + ctk_s2[d]

        # fusion chain, division-free: ct_base_o = ct_w_o * w_o with
        # ct_w_o = ok_inv*[ct_lpf - sum(ct_mf m_f + ct_tf t_f)]
        #        + inv_sw*sum(ct_mf nm_o + ct_tf tl_o)
        # and w_o*inv_sw = wn_o (stashed), w_o*ok_inv = wn_o*ok — the sw
        # factors cancel exactly, so neither sw nor inv_sw is needed
        fac = ct_lpf * ok
        for d in range(D):
            fac = fac - (ct_mf[d] * m_f[d] + ct_tf[d] * t_f[d]) * ok
        ct_bse = []
        for o in range(A):
            s = fac
            for d in range(D):
                s = s + (ct_mf[d] * nmo[d][o] + ct_tf[d] * tlo[d][o])
            ct_bse.append(s * wn[o])

        # prep backward per storage block o (everything g-aligned:
        # ct_bse[o] IS block o's per-slot base cotangent).  ct_prod*prod
        # folds exactly to -0.5*ct_base (ct_prod = -ct_base/(2 prod)),
        # so neither prod nor its rsqrt is ever rebuilt; ct_quad =
        # -ct_base likewise folds into the diff^2 term.  Per-slot
        # outputs assemble as plain concats of the per-o blocks.
        d_m, d_s2, d_l2 = [], [], []
        for d in range(D):
            dmb, dsb, dlb = [], [], None
            for o in range(A):
                sl = slice(o * G, (o + 1) * G)
                inv = invtot[d][sl]
                diff = x[d] - m[d][sl]
                cnw = ct_mf[d] * wn[o]
                ctw = ct_tf[d] * wn[o]
                # fold inv in ONCE: every downstream use multiplies by it
                cn = cnw * inv
                ctl = ctw * inv
                e = diff * inv
                cb2 = 0.5 * ct_bse[o]
                ct_tot = (cb2 * (diff * e - 1.0) * inv
                          - cn * nmo[d][o] - ctl * tlo[d][o])
                dmb.append(ct_bse[o] * e + cn * l2[d]
                           + drop * ct_m[d][sl])
                dsb.append(ct_tot + cn * x[d] + ctl * l2[d]
                           + drop * ct_s2[d][sl])
                dl = jnp.sum(ct_tot + cn * m[d][sl] + ctl * s2[d][sl],
                             axis=0, keepdims=True)
                dlb = dl if dlb is None else dlb + dl
            d_m.append(jnp.concatenate(dmb, axis=0))
            d_s2.append(jnp.concatenate(dsb, axis=0))
            d_l2.append(dlb)
        d_lp = jnp.concatenate(ct_bse, axis=0) + drop * ct_lp
        out = ((jnp.stack(d_m), jnp.stack(d_s2), d_lp), jnp.stack(d_l2),
               d_ltv, d_lsv)
        if per_step:
            d_sg = _rfold(sum_ct_s2, pat_runs, P)
            return out + (jnp.zeros_like(ctk_lp), d_sg)
        return out + (sum_ct_s2,)

    return (prep, close_l2, close_look, interior, interior_bwd,
            close_look_bwd)


def _grad_kernel(xs_ref, l2_ref, len_ref, isbl_ref, lp0_ref, s20_ref,
                 ltv_ref, lsv_ref, endv_ref, s2v_ref, ltn_ref, s2n_ref,
                 lsn_ref, endn_ref, sig2s_ref,
                 logl_ref, ct_l2_ref, ct_lp0_ref, ct_s20_ref, ct_ltv_ref,
                 ct_lsv_ref, ct_endv_ref, ct_s2v_ref, ct_ltn_ref,
                 ct_s2n_ref, ct_lsn_ref, ct_endn_ref, ct_s2s_ref,
                 mh, s2h, lph, ivh, wnh, okh, nmh, tlh, nrm, ilv,
                 *, T, D, K, A, G, BLK, min_len, S=0, P=0, has_len2=True):
    lengths = len_ref[0, :].astype(jnp.int32)
    isbl = isbl_ref[0, :][None, :]
    per_step = P > 0
    if per_step:
        pat_runs = _class_runs(np.arange(K) // (K // P), K, A)
    (prep, close_l2, close_look, interior,
     interior_bwd, close_look_bwd) = _make_step(D, K, A, G, min_len,
                                                S=S, P=P)
    ltv, lsv, endv, s2v = (ltv_ref[:], lsv_ref[:], endv_ref[:], s2v_ref[:])
    ltn, s2n, lsn, endn = (ltn_ref[:], s2n_ref[:], lsn_ref[:], endn_ref[:])

    def read_td(ref, t):
        return jnp.stack([ref[pl.ds(t * D + d, 1), :] for d in range(D)])

    def read_next(ref, t):
        tn = jnp.minimum(t + 1, T - 1)
        return jnp.stack([ref[pl.ds(tn * D + d, 1), :] for d in range(D)])

    def read_sig2(t):
        if not per_step:
            return None
        tc = jnp.minimum(t, T - 2)
        # per-row dynamic loads: a P-row dynamic slice needs its start to be
        # a multiple of the 8-sublane tile, which tc*P isn't for P < 8
        return jnp.concatenate(
            [sig2s_ref[pl.ds(tc * P + p, 1), :] for p in range(P)], axis=0)

    # ---- forward, checkpointing the carry per step ------------------------
    m = jnp.stack([jnp.broadcast_to(xs_ref[pl.ds(d, 1), :], (K, BLK))
                   for d in range(D)])
    if per_step:
        s2_init = jnp.concatenate(
            [jnp.broadcast_to(sig2s_ref[pl.ds(p, 1), :], (n, BLK))
             for p, _, n in pat_runs], axis=0)
        s2 = jnp.stack([l2_ref[pl.ds(d, 1), :] + s2_init for d in range(D)])
    else:
        s2 = jnp.stack([l2_ref[pl.ds(d, 1), :] + s20_ref[:]
                        for d in range(D)])
    lp = jnp.broadcast_to(lp0_ref[:], (K, BLK))
    acc = jnp.zeros((1, BLK), jnp.float32)

    any2 = jnp.any(lengths == 2)
    # scalar firing bounds for the look-ahead closing: per-step vector
    # compare+reduce predicates cost real VPU time; t in [lmin-2, lmax-2]
    # is an exact cover for sorted same-length blocks and a conservative
    # one for mixed blocks (a spurious fire computes a fully-masked zero)
    lmax = jnp.max(lengths)
    lminp = jnp.min(jnp.where(lengths > 0, lengths, T + 2))

    def zero_row(_):
        return jnp.zeros((1, BLK), jnp.float32)

    def fwd_body(t, carry):
        m, s2, lp, acc = carry
        mh[pl.ds(t - 1, 1)] = m[None]
        s2h[pl.ds(t - 1, 1)] = s2[None]
        lph[pl.ds(t - 1, 1)] = lp[None]
        x = read_td(xs_ref, t)
        l2 = read_td(l2_ref, t)
        sig2_t = read_sig2(t)
        # closings are cond-gated: with length-sorted batches each fires
        # on one scan step per block (same scheme as pallas_engine)
        if has_len2:
            acc = acc + jax.lax.cond(
                (t == 1) & any2,
                lambda _: close_l2(m, s2, lp, x, l2, t, lengths, isbl,
                                   endv),
                zero_row, None)
        acc = acc + jax.lax.cond(
            (t >= lminp - 2) & (t <= lmax - 2),
            lambda _: close_look(m, s2, lp, x, l2, read_next(xs_ref, t),
                                 read_next(l2_ref, t), t, lengths, isbl,
                                 ltn, s2n, lsn, endn, sig2_t),
            zero_row, None)
        # the carry produced at the loop's final step is never read (it
        # would feed t = lmax - 1, which is fully masked and skipped):
        # gate the fuse+update away there — its pullback is gated the same
        # way in the backward walk below.  The taken branch also
        # checkpoints the backward stash (invtot/wn/ok) for this step;
        # the skipped step's stash rows are never read.
        def take(_):
            carry, (ivt, wn_cat, ok, nm, tl) = interior(
                m, s2, lp, x, l2, t, lengths, ltv, lsv, s2v, sig2_t,
                with_extras=2)
            ivh[pl.ds(t - 1, 1)] = ivt[None]
            wnh[pl.ds(t - 1, 1)] = wn_cat[None]
            okh[pl.ds(t - 1, 1)] = ok[None]
            nmh[pl.ds(t - 1, 1)] = nm[None]
            tlh[pl.ds(t - 1, 1)] = tl[None]
            return carry

        m, s2, lp = jax.lax.cond(
            t < lmax - 2, take, lambda _: (m, s2, lp), None)
        return (m, s2, lp, acc)

    # dynamic trip count: the last useful step is the look-ahead closing at
    # t = lmax - 2 (t = lmax - 1 is fully masked), so uniform-length blocks
    # skip one dead step (half the loop for 3-frame tracks) and padded
    # blocks skip the rest; the backward walks the same range and the
    # skipped rows of ct_l2 stay at their zero init
    tmax = jnp.maximum(lmax - 1, 2)
    m, s2, lp, acc = jax.lax.fori_loop(1, tmax, fwd_body, (m, s2, lp, acc))
    logl_ref[:] = acc
    # ct_s2s is lane-sharded (per grid block, no cross-program accumulation)
    ct_s2s_ref[:] = jnp.zeros(
        ((T - 1) * P, BLK) if per_step else (1, 1), jnp.float32)
    ct_l2_ref[:] = jnp.zeros((T * D, BLK), jnp.float32)

    # ---- backward: per-step pullbacks -------------------------------------
    # Each step's pullback is split: the interior (fuse + update) replays
    # every step, the two closings' pullbacks are lax.cond-gated exactly
    # like the forward (each fires once per sorted block).  The conds are
    # primal — jax.vjp runs INSIDE the taken branch; differentiating
    # through lax.cond itself is what Mosaic cannot legalize.
    zK = jnp.zeros((K, 1), jnp.float32)
    zKA = jnp.zeros((K, A), jnp.float32)
    zDK = jnp.zeros((D, K, BLK), jnp.float32)
    zKB = jnp.zeros((K, BLK), jnp.float32)
    zD1 = jnp.zeros((D, 1, BLK), jnp.float32)
    ones_acc = jnp.ones((1, BLK), jnp.float32)

    def bwd_body(i, ct):
        t = tmax - 1 - i
        (ct_m, ct_s2, ct_lp, ct_ltv, ct_lsv, ct_endv, ct_s2v,
         ct_ltn, ct_s2n, ct_lsn, ct_endn) = ct
        c3 = (mh[pl.ds(t - 1, 1)][0], s2h[pl.ds(t - 1, 1)][0],
              lph[pl.ds(t - 1, 1)][0])
        x = read_td(xs_ref, t)
        l2 = read_td(l2_ref, t)
        sig2_t = read_sig2(t)

        def pull_int_args():
            return (c3[0], c3[1], c3[2], x, l2, t, lengths,
                    ct_m, ct_s2, ct_lp, ivh[pl.ds(t - 1, 1)][0],
                    wnh[pl.ds(t - 1, 1)][0], okh[pl.ds(t - 1, 1)][0],
                    ilv, nmh[pl.ds(t - 1, 1)][0], tlh[pl.ds(t - 1, 1)][0])

        # the interior pullback at the walk's first step (t = tmax - 1)
        # replays against the all-zero seed cotangent ct0 — pure waste;
        # gated exactly like the forward's final fuse+update.  The
        # pullback itself is the hand-derived interior_bwd (no jax.vjp
        # primal replay; ~25% less work per step than the traced VJP).
        if per_step:
            def pull_int(_):
                return interior_bwd(*pull_int_args())

            def zero_int(_):
                return ((zDK, zDK, zKB), zD1, zKB, zKB, zKB,
                        jnp.zeros((P, BLK), jnp.float32))

            (d_c3, d_l2, d_ltv, d_lsv, d_s2v, d_sg) = jax.lax.cond(
                t < lmax - 2, pull_int, zero_int, None)
        else:
            def pull_int(_):
                return interior_bwd(*pull_int_args())

            def zero_int(_):
                return ((zDK, zDK, zKB), zD1, zKB, zKB, zKB)

            d_c3, d_l2, d_ltv, d_lsv, d_s2v = jax.lax.cond(
                t < lmax - 2, pull_int, zero_int, None)

        if has_len2:
            def pull_l2(_):
                def f2(c3_, l2_, endv_):
                    return close_l2(c3_[0], c3_[1], c3_[2], x, l2_, t,
                                    lengths, isbl, endv_)

                _, pc = jax.vjp(f2, c3, l2, endv)
                return pc(ones_acc)

            def zero_l2(_):
                return ((zDK, zDK, zKB), zD1, zK)

            d2_c3, d2_l2, d_endv = jax.lax.cond((t == 1) & any2,
                                                pull_l2, zero_l2, None)
        else:
            d2_c3, d2_l2, d_endv = (zDK, zDK, zKB), zD1, zK

        if per_step:
            def pull_look(_):
                return close_look_bwd(c3[0], c3[1], c3[2], x, l2,
                                      read_next(xs_ref, t),
                                      read_next(l2_ref, t), t, lengths,
                                      isbl, ltn, s2n, lsn, endn, sig2_t)

            def zero_look(_):
                return ((zDK, zDK, zKB), zD1, zD1, zKA, zKA, zKA, zKA,
                        jnp.zeros((P, BLK), jnp.float32))

            (dL_c3, dL_l2, d_l2n, d_ltn, d_s2n, d_lsn, d_endn,
             dL_sg) = jax.lax.cond((t >= lminp - 2) & (t <= lmax - 2),
                                   pull_look, zero_look, None)
            # t = T-1 clamps onto row T-2's slice; its update is fully
            # masked (no lane is interior or closing there) so += is exact.
            # Per-row dynamic stores for the same 8-sublane alignment
            # reason as read_sig2.
            d_s2s = d_sg + dL_sg
            tc = jnp.minimum(t, T - 2)
            for p in range(P):
                ct_s2s_ref[pl.ds(tc * P + p, 1), :] += d_s2s[p:p + 1]
        else:
            def pull_look(_):
                return close_look_bwd(c3[0], c3[1], c3[2], x, l2,
                                      read_next(xs_ref, t),
                                      read_next(l2_ref, t), t, lengths,
                                      isbl, ltn, s2n, lsn, endn)

            def zero_look(_):
                return ((zDK, zDK, zKB), zD1, zD1, zKA, zKA, zKA, zKA)

            (dL_c3, dL_l2, d_l2n, d_ltn, d_s2n, d_lsn,
             d_endn) = jax.lax.cond((t >= lminp - 2) & (t <= lmax - 2),
                                    pull_look, zero_look, None)

        # row t is set here; the l2_{t+1} cotangent adds to row t+1, which
        # iteration t+1 (already executed — the walk is descending) set
        d_l2_t = d_l2 + d2_l2 + dL_l2
        tn = jnp.minimum(t + 1, T - 1)
        for d in range(D):
            ct_l2_ref[pl.ds(t * D + d, 1), :] = d_l2_t[d]
        for d in range(D):
            ct_l2_ref[pl.ds(tn * D + d, 1), :] += jnp.where(
                t + 1 <= T - 1, d_l2n[d], 0.0)
        return (d_c3[0] + d2_c3[0] + dL_c3[0],
                d_c3[1] + d2_c3[1] + dL_c3[1],
                d_c3[2] + d2_c3[2] + dL_c3[2],
                ct_ltv + d_ltv, ct_lsv + d_lsv, ct_endv + d_endv,
                ct_s2v + d_s2v, ct_ltn + d_ltn, ct_s2n + d_s2n,
                ct_lsn + d_lsn, ct_endn + d_endn)

    # the wide (K, BLK) table-cotangent carriers must START with a
    # materialized {0,0} layout: a plain zeros init is a replicated
    # constant, and Mosaic's loop-carry layout inference then demands the
    # body's materialized yields relayout to replicated — an invalid
    # direction ("Invalid relayout ... replicated in destination but not
    # in source" at the carry add).  A scratch write + fresh read pins it.
    nrm[pl.ds(0, 1)] = jnp.zeros((1, K, BLK), jnp.float32)
    zmat = nrm[pl.ds(0, 1)][0]
    ct0 = (jnp.zeros((D, K, BLK), jnp.float32),
           jnp.zeros((D, K, BLK), jnp.float32),
           jnp.zeros((K, BLK), jnp.float32),
           zmat, zmat, zK, zmat, zKA, zKA, zKA, zKA)
    ct = jax.lax.fori_loop(0, tmax - 1, bwd_body, ct0)
    ct_s2, ct_lp = ct[1], ct[2]

    # ---- init pullback: m0=x0 (no param), s2_0=l2_0+s20, lp_0=lp0 ----------
    # rows 0..D-1 are never touched by the backward loop (t >= 1 and the
    # look-ahead adds only to rows >= 2D), so plain stores are correct
    for d in range(D):
        ct_l2_ref[pl.ds(d, 1), :] = jnp.sum(ct_s2[d], axis=0, keepdims=True)
    ct_lp0 = jnp.sum(ct_lp, axis=1, keepdims=True)
    sum_s2 = ct_s2[0]
    for d in range(1, D):
        sum_s2 = sum_s2 + ct_s2[d]
    ct_s20 = jnp.sum(sum_s2, axis=1, keepdims=True)
    if per_step:
        # s2_0 = l2_0 + sig2[0, pattern(k)]: fold the init cotangent into
        # the step-0 rows (per-pattern storage runs).  The s20 constant
        # input is a traced slice of the same sig2 — its cotangent must
        # stay zero or the init term double-counts.
        d_init = _rfold(sum_s2, pat_runs, P)
        for p in range(P):
            ct_s2s_ref[pl.ds(p, 1), :] += d_init[p:p + 1]
        ct_s20 = jnp.zeros_like(ct_s20)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ct_lp0_ref[:] = jnp.zeros((K, 1), jnp.float32)
        ct_s20_ref[:] = jnp.zeros((K, 1), jnp.float32)
        ct_ltv_ref[:] = jnp.zeros((K, 1), jnp.float32)
        ct_lsv_ref[:] = jnp.zeros((K, 1), jnp.float32)
        ct_endv_ref[:] = jnp.zeros((K, 1), jnp.float32)
        ct_s2v_ref[:] = jnp.zeros((K, 1), jnp.float32)
        ct_ltn_ref[:] = jnp.zeros((K, A), jnp.float32)
        ct_s2n_ref[:] = jnp.zeros((K, A), jnp.float32)
        ct_lsn_ref[:] = jnp.zeros((K, A), jnp.float32)
        ct_endn_ref[:] = jnp.zeros((K, A), jnp.float32)

    ct_lp0_ref[:] += ct_lp0
    ct_s20_ref[:] += ct_s20
    # the interior table cotangents ride the walk lane-resolved (K, BLK);
    # one lane reduce each here, outside the loop
    ct_ltv_ref[:] += jnp.sum(ct[3], axis=1, keepdims=True)
    ct_lsv_ref[:] += jnp.sum(ct[4], axis=1, keepdims=True)
    ct_endv_ref[:] += ct[5]
    ct_s2v_ref[:] += jnp.sum(ct[6], axis=1, keepdims=True)
    ct_ltn_ref[:] += ct[7]
    ct_s2n_ref[:] += ct[8]
    ct_lsn_ref[:] += ct[9]
    ct_endn_ref[:] += ct[10]


def _grad_call(static, xs, l2, lengths_f, isbl, lp0, s20, ltv, lsv, endv,
               s2v, ltn, s2n, lsn, endn, sig2s):
    T, D, K, A, G, BLK, min_len, S, P, has_len2 = static
    per_step = P > 0
    Bp = xs.shape[1]
    # o-major storage: register-indexed tables go in permuted, their
    # cotangents come back permuted (storage_order docstring); l2 (rows
    # t*D+d) and the sig2 stream (rows t*P+p) are not register-indexed
    to_s, from_s = storage_order(K, A)
    fidx, tidx = jnp.asarray(from_s), jnp.asarray(to_s)

    def perm(v):
        return jnp.take(v, fidx, axis=0)

    lp0, s20, ltv, lsv, endv, s2v = map(
        perm, (lp0, s20, ltv, lsv, endv, s2v))
    ltn, s2n, lsn, endn = map(perm, (ltn, s2n, lsn, endn))
    kernel = functools.partial(_grad_kernel, T=T, D=D, K=K, A=A, G=G,
                               BLK=BLK, min_len=min_len, S=S, P=P,
                               has_len2=has_len2)
    track_spec = pl.BlockSpec((T * D, BLK), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((K, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((K, A), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    if per_step:
        s2s_spec = pl.BlockSpec(((T - 1) * P, BLK), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        s2s_shape = jax.ShapeDtypeStruct(((T - 1) * P, Bp), jnp.float32)
    else:
        s2s_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        s2s_shape = jax.ShapeDtypeStruct((1, 1), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // BLK,),
        in_specs=[track_spec, track_spec, row_spec, row_spec]
        + [vec_spec] * 6 + [mat_spec] * 4 + [s2s_spec],
        out_specs=[row_spec, track_spec] + [vec_spec] * 6 + [mat_spec] * 4
        + [s2s_spec],
        out_shape=[jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((T * D, Bp), jnp.float32)]
        + [jax.ShapeDtypeStruct((K, 1), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((K, A), jnp.float32)] * 4
        + [s2s_shape],
        scratch_shapes=[pltpu.VMEM((T - 1, D, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, D, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, D, K, BLK), jnp.float32),  # ivh
                        pltpu.VMEM((T - 1, K, BLK), jnp.float32),     # wnh
                        pltpu.VMEM((T - 1, K // A, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, D, K, BLK), jnp.float32),  # nmh
                        pltpu.VMEM((T - 1, D, K, BLK), jnp.float32),  # tlh
                        pltpu.VMEM((1, K, BLK), jnp.float32),   # zmat
                        pltpu.VMEM((1 + 2 * D, G, BLK), jnp.float32)],
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=GRAD_VMEM_LIMIT),
        interpret=INTERPRET,
    )(xs, l2, lengths_f, isbl, lp0, s20, ltv, lsv, endv, s2v,
      ltn, s2n, lsn, endn, sig2s)
    # depermute the register-indexed cotangents back to slot order
    return (tuple(out[:2])
            + tuple(jnp.take(o, tidx, axis=0) for o in out[2:12])
            + (out[12],))


def _value_call(static, xs, l2, lengths_f, isbl, lp0, s20, ltv, lsv, endv,
                s2v, ltn, s2n, lsn, endn, sig2s):
    """Value-only dispatch on the FORWARD kernel.

    The custom-vjp primal below runs when nobody differentiates; paying
    the gradient kernel's carry-history scratch plus its whole backward
    walk there would cost ~3x the forward kernel for the same scalar."""
    from extrack_tpu.ops import pallas_engine as pe
    T, D, K, A, G, BLK, min_len, S, P, _ = static
    per_step = P > 0
    Bp = xs.shape[1]
    # same o-major permutation as _grad_call (pe._kernel picks the
    # o-major layout whenever A | G, which prepare_args guarantees here)
    _, from_s = storage_order(K, A)
    fidx = jnp.asarray(from_s)
    lp0, s20, ltv, lsv, endv, s2v = (
        jnp.take(v, fidx, axis=0)
        for v in (lp0, s20, ltv, lsv, endv, s2v))
    ltn, s2n, lsn, endn = (jnp.take(v, fidx, axis=0)
                           for v in (ltn, s2n, lsn, endn))
    kernel = functools.partial(pe._kernel, T=T, D=D, K=K, A=A, G=G,
                               BLK=BLK, min_len=min_len, S=S, P=P)
    track_spec = pl.BlockSpec((T * D, BLK), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((K, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((K, A), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    if per_step:
        s2v_spec = pl.BlockSpec(((T - 1) * P, BLK), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        s2v_arg = sig2s
    else:
        s2v_spec = vec_spec
        s2v_arg = s2v
    out = pl.pallas_call(
        kernel,
        grid=(Bp // BLK,),
        in_specs=[track_spec, track_spec, row_spec, row_spec,
                  vec_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                  s2v_spec, mat_spec, mat_spec, mat_spec, mat_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, K, BLK), jnp.float32),
                        pltpu.VMEM((D, K, BLK), jnp.float32),
                        pltpu.VMEM((K, BLK), jnp.float32)],
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(xs, l2, lengths_f.astype(jnp.int32), isbl, lp0, s20, ltv, lsv, endv,
      s2v_arg, ltn, s2n, lsn, endn)
    return -jnp.sum(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _neg_logl(static, xs, l2, lengths_f, isbl, lp0, s20, ltv, lsv, endv,
              s2v, ltn, s2n, lsn, endn, sig2s):
    return _value_call(static, xs, l2, lengths_f, isbl, lp0, s20, ltv, lsv,
                       endv, s2v, ltn, s2n, lsn, endn, sig2s)


def _neg_logl_fwd(static, xs, l2, lengths_f, isbl, lp0, s20, ltv, lsv, endv,
                  s2v, ltn, s2n, lsn, endn, sig2s):
    out = _grad_call(static, xs, l2, lengths_f, isbl, lp0, s20, ltv, lsv,
                     endv, s2v, ltn, s2n, lsn, endn, sig2s)
    value = -jnp.sum(out[0])
    residuals = ((xs, lengths_f, isbl), out[1], tuple(out[2:8]),
                 tuple(out[8:12]), out[12])
    return value, residuals


def _neg_logl_bwd(static, residuals, g):
    """Cotangents for (xs, l2, lengths_f, isbl, lp0, s20, ltv, lsv, endv,
    s2v, ltn, s2n, lsn, endn, sig2s).

    Positions (xs) get a ZERO cotangent: the backward walk accumulates
    table/loc-err/dt cotangents only (the fit differentiates parameters,
    never the data).  jax.grad of neg_log_likelihood w.r.t. positions is
    therefore silently zero on this path — use the XLA engine
    (core.engine.forward) for position sensitivities."""
    (xs, lengths_f, isbl), ct_l2, ct_vecs, ct_mats, ct_s2s = residuals
    s = -g
    return (jnp.zeros_like(xs), s * ct_l2, jnp.zeros_like(lengths_f),
            jnp.zeros_like(isbl)) \
        + tuple(s * c for c in ct_vecs) \
        + tuple(s * c for c in ct_mats) \
        + (s * ct_s2s,)


_neg_logl.defvjp(_neg_logl_fwd, _neg_logl_bwd)


# Mosaic's scoped-VMEM allocation covers the declared scratch (the carry
# history) PLUS the live set of the in-kernel pullback, which grows with
# the look-ahead branch count A = S^n.  Blocks are sized so both fit the
# budget.  The gradient kernel gets its own, higher limit than the
# forward kernel (v5e/v5p have 128MiB of physical VMEM per core): the
# 3-state W=5 walk at BLK=384 measured vg 3.48M vs 3.40M tracks/s at
# the old 52MiB/BLK=256 cap, and the budget is what gates the block.
_SCRATCH_BUDGET = 76 * 1024 * 1024
GRAD_VMEM_LIMIT = 104 * 1024 * 1024


def supported_block(T: int, D: int, K: int, A: int = 2) -> int:
    """Largest lane-multiple block whose carry history + pullback live set
    fits the VMEM budget (0 = unsupported; callers fall back to XLA).

    History = (m, s2, lp) + the backward stash (invtot, wn, ok, new_m,
    tail) per step plus the zmat + interleave-normalization scratch."""
    history = ((T - 1) * ((5 * D + 2) * K + K // A) * 4
               + (K + (1 + 2 * D) * (K // A)) * 4)
    # per-lane pullback live set, calibrated on Mosaic's reported scoped
    # allocation (19.5MiB at K=81, A=9, D=2, BLK=256)
    live = (8 * A * D + 40) * K * 4
    return (_SCRATCH_BUDGET // (history + live)) // 128 * 128


def supports(T: int, D: int, nb_states: int, window: int,
             nb_substeps: int = 1) -> bool:
    K, A = nb_states ** window, nb_states ** nb_substeps
    if A > 1 and (K // A) % A:
        # o-major storage needs A | G (window >= 2*nb_substeps); the one
        # real config outside it (window == nb_substeps + 1 with
        # nb_substeps >= 2) runs the XLA engine instead
        return False
    return supported_block(T, D, K, A) >= 128


def neg_log_likelihood(positions, lengths, is_bleached, tables: ModelTables,
                       *, window: int = 6, nb_substeps: int = 1,
                       min_len: int = 3, block: int = 512,
                       has_len2: bool = True):
    """-sum logL, differentiable w.r.t. the model tables and loc errors,
    with both passes as VMEM-resident Pallas kernels.

    Variable dt rides along as a lane-sharded ((T-1)*P, B) displacement-
    variance stream (differentiable — its cotangent flows back to Ds/dt
    through the stream construction).

    NOT differentiable w.r.t. ``positions``: the backward walk accumulates
    table cotangents only, so jax.grad w.r.t. the data is silently ZERO
    here (the fit never needs it); use core.engine.forward for position
    sensitivities.  Value-only calls (outside jax.grad) dispatch the cheap
    forward kernel instead of the fwd+bwd pair.

    ``has_len2=False`` statically removes the 2-frame-track closing from
    both passes; callers that know the dataset host-side (fit objectives
    check the cached np_lengths) set it so the common no-2-frame case pays
    one gated closing per step instead of two."""
    static, xs, lengths_f, isbl, dargs = prepare_args(
        positions, lengths, is_bleached, tables, window=window,
        nb_substeps=nb_substeps, min_len=min_len, block=block,
        has_len2=has_len2)
    return _neg_logl(static, xs, dargs[0], lengths_f, isbl, *dargs[1:])


def prepare_args(positions, lengths, is_bleached, tables: ModelTables,
                 *, window: int = 6, nb_substeps: int = 1,
                 min_len: int = 3, block: int = 512,
                 has_len2: bool = True):
    """Kernel-argument construction, split out so second-order callers
    (ops/pallas_hvp.py) can differentiate the tables -> kernel-args map.

    Returns (static, xs, lengths_f, isbl, dargs) with dargs the tuple of
    DIFFERENTIABLE kernel inputs in backward-cotangent order:
    (l2, lp0, s20, ltv, lsv, endv, s2v, ltn, s2n, lsn, endn, sig2s)."""
    B, T, D = positions.shape
    S = tables.nb_states
    W, n = window, nb_substeps
    K, A = S ** W, S ** n
    G = K // A
    P = S ** (n + 1)
    f32 = jnp.float32
    sig2 = tables.sig2
    per_step = classify_sig2(sig2, T)
    if A > 1 and G % A:
        raise NotImplementedError(
            f"window ({W}) must be >= 2*nb_substeps ({2 * n}) for the "
            "o-major storage layout — use the XLA engine")
    max_blk = supported_block(T, D, K, A)
    if max_blk < 128:
        raise NotImplementedError(
            f"carry history for T={T}, K={K} exceeds the VMEM budget — "
            "use the XLA engine")
    block = min(block, max_blk)

    lp0, s20, lt, lsurv, end, sig2v = [
        v.astype(f32)[:, None] for v in build_slot_tables(tables, W, n)]
    # the kernel drops the per-step 2*pi normalizer constants; every fusion
    # adds lt, so the per-fusion constant folds here (exact; a constant
    # shift leaves lt's cotangent unchanged)
    lt = lt - f32(0.5 * D * np.log(2 * np.pi))
    ltn, s2n, lsn, endn = [v.astype(f32)
                           for v in build_next_tables(tables, W, n)]
    # s20 and sig2v come from the same table; passing the same traced array
    # twice makes JAX sum both cotangents into its source automatically

    BLK = min(block, max(128, 1 << (B - 1).bit_length()))
    Bp = int(np.ceil(B / BLK)) * BLK
    l2 = jnp.broadcast_to(tables.loc_err2.astype(f32), (B, T, D))
    xs = positions.astype(f32).transpose(1, 2, 0).reshape(T * D, B)
    l2 = l2.transpose(1, 2, 0).reshape(T * D, B)
    if per_step:
        # the same lane-sharded stream the other three kernels use (row
        # t*P+p, padded lanes at 1.0); its ops are all differentiable so
        # the s2s cotangent flows back to Ds/dt through it
        sig2s, _ = _sig2_stream(sig2, T, P, B, Bp, BLK, f32)
    else:
        sig2s = jnp.zeros((1, 1), f32)
    if Bp != B:
        xs = jnp.pad(xs, ((0, 0), (0, Bp - B)))
        l2 = jnp.pad(l2, ((0, 0), (0, Bp - B)), constant_values=1.0)
        lengths = jnp.pad(lengths, (0, Bp - B))
        is_bleached = jnp.pad(is_bleached, (0, Bp - B))
    lengths_f = lengths.astype(f32)[None, :]
    isbl = is_bleached.astype(f32)[None, :]

    static = (T, D, K, A, G, BLK, min_len,
              S if per_step else 0, P if per_step else 0, bool(has_len2))
    return static, xs, lengths_f, isbl, (
        l2, lp0, sig2v, lt, lsurv, end, sig2v, ltn, s2n, lsn, endn, sig2s)
