"""Exact Hessian-vector products through the Pallas likelihood kernels.

The fit's error bars need d²(-logL)/dz² at the optimum.  jax.hessian
cannot compose through the gradient kernel's custom_vjp (second-order AD
stops at a custom rule), and round 3 shipped central differences of the
exact gradients instead (fit.hessian_fd_from_gradients).  This module
makes the second order EXACT on the Pallas path:

* ``_hvp_kernel`` runs the same forward-stash + hand-derived backward
  walk as ops/pallas_grad._grad_kernel on **dual numbers**: every carry,
  stash and cotangent rides with its directional tangent, produced by
  ``jax.jvp`` over the SAME step functions (_make_step's interior /
  interior_bwd / closings) the gradient kernel uses — no re-derivation,
  so any future change to the step math propagates automatically.  The
  closing pullbacks become jvp-of-vjp inside the same primal lax.cond
  gates (differentiating THROUGH the cond is what Mosaic cannot
  legalize; running jvp/vjp inside the taken branch is fine — see
  CLAUDE.md).

* ``table_grads`` exposes the kernel's table cotangents as a
  ``jax.custom_jvp`` function whose tangent rule dispatches the HVP
  kernel, so ``jax.jvp(grad_z, (z,), (e_j,))`` builds exact Hessian
  columns end to end: the z -> kernel-args map (params.extract_arrays,
  tables.build_tables, build_slot_tables) is plain XLA that JAX
  differentiates to second order by itself.

Reference: the reference package has no error bars at all; this backs
fit(compute_errors=True) (SURVEY.md §2.8) at any dataset size without
leaving the TPU kernels.

NOT differentiable w.r.t. positions (same contract as
pallas_grad.neg_log_likelihood): position tangents are ignored.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from extrack_tpu.ops import pallas_grad as _pg
from extrack_tpu.ops.pallas_grad import _make_step, prepare_args

# The dual kernel is dispatched once per Hessian column at the END of a
# fit — never inside the optimizer loop — so it can spend more VMEM than
# the first-order kernels: the budget covers the default 3-state (K=243)
# and 4-state (K=256) windows at BLK=128, where fit(compute_errors=True)
# used to silently fall back to finite differences (VERDICT r4 #3).
# v5e/v5p have 128 MiB of physical VMEM per core; Mosaic's scoped
# allocation at these shapes measures ~56 MiB (declared scratch ~20 MiB +
# the traced jvp-of-vjp live set).
_SCRATCH_BUDGET = 52 * 1024 * 1024
VMEM_LIMIT = 100 * 1024 * 1024


def supported_block(T: int, D: int, K: int, A: int = 2) -> int:
    """Largest lane-multiple block for the DUAL kernel: primal history +
    tangent history + a dual pullback live set (~2x the gradient
    kernel's)."""
    history = ((T - 1) * ((6 * D + 4) * K + K // A) * 4
               + K * 4)
    live = 2 * (8 * A * D + 40) * K * 4
    return (_SCRATCH_BUDGET // (history + live)) // 128 * 128


def supports(T: int, D: int, nb_states: int, window: int,
             nb_substeps: int = 1) -> bool:
    K, A = nb_states ** window, nb_states ** nb_substeps
    if A > 1 and (K // A) % A:
        return False                 # o-major layout needs A | G
    return supported_block(T, D, K, A) >= 128


def _hvp_kernel(xs_ref, len_ref, isbl_ref,
                l2_ref, lp0_ref, s20_ref, ltv_ref, lsv_ref, endv_ref,
                s2v_ref, ltn_ref, s2n_ref, lsn_ref, endn_ref, sig2s_ref,
                l2t_ref, lp0t_ref, s20t_ref, ltvt_ref, lsvt_ref,
                endvt_ref, s2vt_ref, ltnt_ref, s2nt_ref, lsnt_ref,
                endnt_ref, sig2st_ref,
                logl_ref, ct_l2_ref, ct_lp0_ref, ct_s20_ref, ct_ltv_ref,
                ct_lsv_ref, ct_endv_ref, ct_s2v_ref, ct_ltn_ref,
                ct_s2n_ref, ct_lsn_ref, ct_endn_ref, ct_s2s_ref,
                loglt_ref, ctt_l2_ref, ctt_lp0_ref, ctt_s20_ref,
                ctt_ltv_ref, ctt_lsv_ref, ctt_endv_ref, ctt_s2v_ref,
                ctt_ltn_ref, ctt_s2n_ref, ctt_lsn_ref, ctt_endn_ref,
                ctt_s2s_ref,
                mh, s2h, lph, mth, s2th, lpth, ivh, ivth, wnh, wnth, okh,
                nrm,
                *, T, D, K, A, G, BLK, min_len, S=0, P=0, has_len2=True):
    lengths = len_ref[0, :].astype(jnp.int32)
    isbl = isbl_ref[0, :][None, :]
    per_step = P > 0
    (prep, close_l2, close_look, interior,
     interior_bwd, _close_look_bwd) = _make_step(D, K, A, G, min_len,
                                                 S=S, P=P)
    ltv, lsv, endv, s2v = (ltv_ref[:], lsv_ref[:], endv_ref[:], s2v_ref[:])
    ltn, s2n, lsn, endn = (ltn_ref[:], s2n_ref[:], lsn_ref[:], endn_ref[:])
    ltvt, lsvt, endvt, s2vt = (ltvt_ref[:], lsvt_ref[:], endvt_ref[:],
                               s2vt_ref[:])
    ltnt, s2nt, lsnt, endnt = (ltnt_ref[:], s2nt_ref[:], lsnt_ref[:],
                               endnt_ref[:])

    def read_td(ref, t):
        return jnp.stack([ref[pl.ds(t * D + d, 1), :] for d in range(D)])

    def read_next(ref, t):
        tn = jnp.minimum(t + 1, T - 1)
        return jnp.stack([ref[pl.ds(tn * D + d, 1), :] for d in range(D)])

    def read_sig2(ref, t):
        if not per_step:
            return None
        tc = jnp.minimum(t, T - 2)
        return jnp.concatenate(
            [ref[pl.ds(tc * P + p, 1), :] for p in range(P)], axis=0)

    # ---- dual forward, checkpointing primal AND tangent carries ------------
    m = jnp.stack([jnp.broadcast_to(xs_ref[pl.ds(d, 1), :], (K, BLK))
                   for d in range(D)])
    mt = jnp.zeros_like(m)                      # positions carry no tangent
    if per_step:
        # o-major storage: per-pattern runs (pallas_grad._class_runs)
        pat_runs = _pg._class_runs(np.arange(K) // (K // P), K, A)

        def s2i(ref):
            return jnp.concatenate(
                [jnp.broadcast_to(ref[pl.ds(p, 1), :], (n, BLK))
                 for p, _, n in pat_runs], axis=0)

        s2 = jnp.stack([l2_ref[pl.ds(d, 1), :] + s2i(sig2s_ref)
                        for d in range(D)])
        s2t = jnp.stack([l2t_ref[pl.ds(d, 1), :] + s2i(sig2st_ref)
                         for d in range(D)])
    else:
        s2 = jnp.stack([l2_ref[pl.ds(d, 1), :] + s20_ref[:]
                        for d in range(D)])
        s2t = jnp.stack([l2t_ref[pl.ds(d, 1), :] + s20t_ref[:]
                         for d in range(D)])
    lp = jnp.broadcast_to(lp0_ref[:], (K, BLK))
    lpt = jnp.broadcast_to(lp0t_ref[:], (K, BLK))
    acc = jnp.zeros((1, BLK), jnp.float32)
    acct = jnp.zeros((1, BLK), jnp.float32)

    any2 = jnp.any(lengths == 2)
    lmax = jnp.max(lengths)
    lminp = jnp.min(jnp.where(lengths > 0, lengths, T + 2))

    def zero2(_):
        z = jnp.zeros((1, BLK), jnp.float32)
        return z, z

    def fwd_body(t, carry):
        m, s2, lp, mt, s2t, lpt, acc, acct = carry
        mh[pl.ds(t - 1, 1)] = m[None]
        s2h[pl.ds(t - 1, 1)] = s2[None]
        lph[pl.ds(t - 1, 1)] = lp[None]
        mth[pl.ds(t - 1, 1)] = mt[None]
        s2th[pl.ds(t - 1, 1)] = s2t[None]
        lpth[pl.ds(t - 1, 1)] = lpt[None]
        x = read_td(xs_ref, t)
        l2 = read_td(l2_ref, t)
        l2t = read_td(l2t_ref, t)
        sig2_t = read_sig2(sig2s_ref, t)
        sig2_tt = read_sig2(sig2st_ref, t)

        if has_len2:
            def take2(_):
                def f(m_, s2_, lp_, l2_, endv_):
                    return close_l2(m_, s2_, lp_, x, l2_, t, lengths,
                                    isbl, endv_)
                return jax.jvp(f, (m, s2, lp, l2, endv),
                               (mt, s2t, lpt, l2t, endvt))

            pa, pat = jax.lax.cond((t == 1) & any2, take2, zero2, None)
            acc = acc + pa
            acct = acct + pat

        xn = read_next(xs_ref, t)
        l2n = read_next(l2_ref, t)
        l2nt = read_next(l2t_ref, t)

        def takeL(_):
            if per_step:
                def f(m_, s2_, lp_, l2_, l2n_, ltn_, s2n_, lsn_, endn_,
                      sg_):
                    return close_look(m_, s2_, lp_, x, l2_, xn, l2n_, t,
                                      lengths, isbl, ltn_, s2n_, lsn_,
                                      endn_, sg_)
                return jax.jvp(
                    f, (m, s2, lp, l2, l2n, ltn, s2n, lsn, endn, sig2_t),
                    (mt, s2t, lpt, l2t, l2nt, ltnt, s2nt, lsnt, endnt,
                     sig2_tt))

            def f(m_, s2_, lp_, l2_, l2n_, ltn_, s2n_, lsn_, endn_):
                return close_look(m_, s2_, lp_, x, l2_, xn, l2n_, t,
                                  lengths, isbl, ltn_, s2n_, lsn_, endn_)
            return jax.jvp(f, (m, s2, lp, l2, l2n, ltn, s2n, lsn, endn),
                           (mt, s2t, lpt, l2t, l2nt, ltnt, s2nt, lsnt,
                            endnt))

        pa, pat = jax.lax.cond((t >= lminp - 2) & (t <= lmax - 2),
                               takeL, zero2, None)
        acc = acc + pa
        acct = acct + pat

        def take(_):
            if per_step:
                def f(m_, s2_, lp_, l2_, ltv_, lsv_, s2v_, sg_):
                    return interior(m_, s2_, lp_, x, l2_, t, lengths,
                                    ltv_, lsv_, s2v_, sg_,
                                    with_extras=True)
                (c, ex), (cd, exd) = jax.jvp(
                    f, (m, s2, lp, l2, ltv, lsv, s2v, sig2_t),
                    (mt, s2t, lpt, l2t, ltvt, lsvt, s2vt, sig2_tt))
            else:
                def f(m_, s2_, lp_, l2_, ltv_, lsv_, s2v_):
                    return interior(m_, s2_, lp_, x, l2_, t, lengths,
                                    ltv_, lsv_, s2v_, None,
                                    with_extras=True)
                (c, ex), (cd, exd) = jax.jvp(
                    f, (m, s2, lp, l2, ltv, lsv, s2v),
                    (mt, s2t, lpt, l2t, ltvt, lsvt, s2vt))
            ivh[pl.ds(t - 1, 1)] = ex[0][None]
            wnh[pl.ds(t - 1, 1)] = ex[1][None]
            okh[pl.ds(t - 1, 1)] = ex[2][None]
            ivth[pl.ds(t - 1, 1)] = exd[0][None]
            wnth[pl.ds(t - 1, 1)] = exd[1][None]
            return c + cd

        m, s2, lp, mt, s2t, lpt = jax.lax.cond(
            t < lmax - 2, take,
            lambda _: (m, s2, lp, mt, s2t, lpt), None)
        return (m, s2, lp, mt, s2t, lpt, acc, acct)

    tmax = jnp.maximum(lmax - 1, 2)
    out = jax.lax.fori_loop(1, tmax, fwd_body,
                            (m, s2, lp, mt, s2t, lpt, acc, acct))
    logl_ref[:] = out[6]
    loglt_ref[:] = out[7]
    shape_s2s = ((T - 1) * P, BLK) if per_step else (1, 1)
    ct_s2s_ref[:] = jnp.zeros(shape_s2s, jnp.float32)
    ctt_s2s_ref[:] = jnp.zeros(shape_s2s, jnp.float32)
    ct_l2_ref[:] = jnp.zeros((T * D, BLK), jnp.float32)
    ctt_l2_ref[:] = jnp.zeros((T * D, BLK), jnp.float32)

    # ---- dual backward walk ------------------------------------------------
    zK = jnp.zeros((K, 1), jnp.float32)
    zKA = jnp.zeros((K, A), jnp.float32)
    zDK = jnp.zeros((D, K, BLK), jnp.float32)
    zKB = jnp.zeros((K, BLK), jnp.float32)
    zD1 = jnp.zeros((D, 1, BLK), jnp.float32)
    zP = jnp.zeros((P, BLK), jnp.float32) if per_step else None
    ones_acc = jnp.ones((1, BLK), jnp.float32)

    def bwd_body(i, ct):
        t = tmax - 1 - i
        (ct_m, ct_s2, ct_lp, ct_ltv, ct_lsv, ct_endv, ct_s2v,
         ct_ltn, ct_s2n, ct_lsn, ct_endn,
         dt_m, dt_s2, dt_lp, dt_ltv, dt_lsv, dt_endv, dt_s2v,
         dt_ltn, dt_s2n, dt_lsn, dt_endn) = ct
        c3 = (mh[pl.ds(t - 1, 1)][0], s2h[pl.ds(t - 1, 1)][0],
              lph[pl.ds(t - 1, 1)][0])
        c3t = (mth[pl.ds(t - 1, 1)][0], s2th[pl.ds(t - 1, 1)][0],
               lpth[pl.ds(t - 1, 1)][0])
        x = read_td(xs_ref, t)
        l2 = read_td(l2_ref, t)
        l2t = read_td(l2t_ref, t)
        sig2_t = read_sig2(sig2s_ref, t)
        sig2_tt = read_sig2(sig2st_ref, t)
        iv = ivh[pl.ds(t - 1, 1)][0]
        ivt = ivth[pl.ds(t - 1, 1)][0]
        wn = wnh[pl.ds(t - 1, 1)][0]
        wnt = wnth[pl.ds(t - 1, 1)][0]
        ok = okh[pl.ds(t - 1, 1)][0]

        # interior pullback + its tangent: ok's tangent is zero a.e. (a
        # threshold indicator), so it rides as a constant
        def pull_int(_):
            def f(m_, s2_, lp_, l2_, cm, cs, cl, iv_, wn_):
                return interior_bwd(m_, s2_, lp_, x, l2_, t, lengths,
                                    cm, cs, cl, iv_, wn_, ok, None)
            return jax.jvp(
                f, (c3[0], c3[1], c3[2], l2, ct_m, ct_s2, ct_lp, iv, wn),
                (c3t[0], c3t[1], c3t[2], l2t, dt_m, dt_s2, dt_lp, ivt,
                 wnt))

        if per_step:
            def zero_int(_):
                z = ((zDK, zDK, zKB), zD1, zKB, zKB, zKB, zP)
                return z, z
        else:
            def zero_int(_):
                z = ((zDK, zDK, zKB), zD1, zKB, zKB, zKB)
                return z, z

        p_int, t_int = jax.lax.cond(t < lmax - 2, pull_int, zero_int,
                                    None)

        if has_len2:
            def pull_l2(_):
                def g(c3_, l2_, endv_):
                    def f2(c3__, l2__, endv__):
                        return close_l2(c3__[0], c3__[1], c3__[2], x,
                                        l2__, t, lengths, isbl, endv__)
                    _, pc = jax.vjp(f2, c3_, l2_, endv_)
                    return pc(ones_acc)
                return jax.jvp(g, (c3, l2, endv), (c3t, l2t, endvt))

            def zero_l2(_):
                z = ((zDK, zDK, zKB), zD1, zK)
                return z, z

            p_l2, t_l2 = jax.lax.cond((t == 1) & any2, pull_l2, zero_l2,
                                      None)
        else:
            z = ((zDK, zDK, zKB), zD1, zK)
            p_l2, t_l2 = z, z

        xn = read_next(xs_ref, t)
        l2n = read_next(l2_ref, t)
        l2nt = read_next(l2t_ref, t)

        def pull_look(_):
            if per_step:
                def g(c3_, l2_, l2n_, ltn_, s2n_, lsn_, endn_, sg_):
                    def fL(*a):
                        return close_look(a[0][0], a[0][1], a[0][2], x,
                                          a[1], xn, a[2], t, lengths,
                                          isbl, a[3], a[4], a[5], a[6],
                                          a[7])
                    _, pc = jax.vjp(fL, c3_, l2_, l2n_, ltn_, s2n_, lsn_,
                                    endn_, sg_)
                    return pc(ones_acc)
                return jax.jvp(
                    g, (c3, l2, l2n, ltn, s2n, lsn, endn, sig2_t),
                    (c3t, l2t, l2nt, ltnt, s2nt, lsnt, endnt, sig2_tt))

            def g(c3_, l2_, l2n_, ltn_, s2n_, lsn_, endn_):
                def fL(*a):
                    return close_look(a[0][0], a[0][1], a[0][2], x, a[1],
                                      xn, a[2], t, lengths, isbl, a[3],
                                      a[4], a[5], a[6])
                _, pc = jax.vjp(fL, c3_, l2_, l2n_, ltn_, s2n_, lsn_,
                                endn_)
                return pc(ones_acc)
            return jax.jvp(g, (c3, l2, l2n, ltn, s2n, lsn, endn),
                           (c3t, l2t, l2nt, ltnt, s2nt, lsnt, endnt))

        if per_step:
            def zero_look(_):
                z = ((zDK, zDK, zKB), zD1, zD1, zKA, zKA, zKA, zKA, zP)
                return z, z
        else:
            def zero_look(_):
                z = ((zDK, zDK, zKB), zD1, zD1, zKA, zKA, zKA, zKA)
                return z, z

        p_lk, t_lk = jax.lax.cond((t >= lminp - 2) & (t <= lmax - 2),
                                  pull_look, zero_look, None)

        if per_step:
            tc = jnp.minimum(t, T - 2)
            # per_step interior_bwd returns (..., zeros, d_sg)
            p_sg = p_int[5] + p_lk[7]
            t_sg = t_int[5] + t_lk[7]
            for p in range(P):
                ct_s2s_ref[pl.ds(tc * P + p, 1), :] += p_sg[p:p + 1]
                ctt_s2s_ref[pl.ds(tc * P + p, 1), :] += t_sg[p:p + 1]

        d_l2_t = p_int[1] + p_l2[1] + p_lk[1]
        dt_l2_t = t_int[1] + t_l2[1] + t_lk[1]
        tn = jnp.minimum(t + 1, T - 1)
        for d in range(D):
            ct_l2_ref[pl.ds(t * D + d, 1), :] = d_l2_t[d]
            ctt_l2_ref[pl.ds(t * D + d, 1), :] = dt_l2_t[d]
        for d in range(D):
            gate_n = (t + 1 <= T - 1)
            ct_l2_ref[pl.ds(tn * D + d, 1), :] += jnp.where(
                gate_n, p_lk[2][d], 0.0)
            ctt_l2_ref[pl.ds(tn * D + d, 1), :] += jnp.where(
                gate_n, t_lk[2][d], 0.0)

        def nxt(pi, pl2, plk, ti, tl2, tlk):
            return (pi[0][0] + pl2[0][0] + plk[0][0],
                    pi[0][1] + pl2[0][1] + plk[0][1],
                    pi[0][2] + pl2[0][2] + plk[0][2],
                    ct_ltv + pi[2], ct_lsv + pi[3], ct_endv + pl2[2],
                    ct_s2v + pi[4], ct_ltn + plk[3], ct_s2n + plk[4],
                    ct_lsn + plk[5], ct_endn + plk[6],
                    ti[0][0] + tl2[0][0] + tlk[0][0],
                    ti[0][1] + tl2[0][1] + tlk[0][1],
                    ti[0][2] + tl2[0][2] + tlk[0][2],
                    dt_ltv + ti[2], dt_lsv + ti[3], dt_endv + tl2[2],
                    dt_s2v + ti[4], dt_ltn + tlk[3], dt_s2n + tlk[4],
                    dt_lsn + tlk[5], dt_endn + tlk[6])

        # note: the dual endv cotangent keeps the primal/tangent split
        # (ct_endv accumulates p_l2[2], dt_endv accumulates t_l2[2])
        return nxt(p_int, p_l2, p_lk, t_int, t_l2, t_lk)

    nrm[pl.ds(0, 1)] = jnp.zeros((1, K, BLK), jnp.float32)
    zmat = nrm[pl.ds(0, 1)][0]
    ct0 = ((jnp.zeros((D, K, BLK), jnp.float32),) * 2
           + (jnp.zeros((K, BLK), jnp.float32),)
           + (zmat, zmat, zK, zmat, zKA, zKA, zKA, zKA)) * 2
    ct = jax.lax.fori_loop(0, tmax - 1, bwd_body, ct0)
    (ct_m, ct_s2, ct_lp) = ct[0], ct[1], ct[2]
    (dt_m, dt_s2, dt_lp) = ct[11], ct[12], ct[13]

    # ---- init pullback (primal and tangent legs are identical code) -------
    for d in range(D):
        ct_l2_ref[pl.ds(d, 1), :] = jnp.sum(ct_s2[d], axis=0,
                                            keepdims=True)
        ctt_l2_ref[pl.ds(d, 1), :] = jnp.sum(dt_s2[d], axis=0,
                                             keepdims=True)

    def init_fold(ct_s2, ct_lp, s2s_ref_out):
        ct_lp0 = jnp.sum(ct_lp, axis=1, keepdims=True)
        sum_s2 = ct_s2[0]
        for d in range(1, D):
            sum_s2 = sum_s2 + ct_s2[d]
        ct_s20 = jnp.sum(sum_s2, axis=1, keepdims=True)
        if per_step:
            d_init = _pg._rfold(sum_s2, pat_runs, P)
            for p in range(P):
                s2s_ref_out[pl.ds(p, 1), :] += d_init[p:p + 1]
            ct_s20 = jnp.zeros_like(ct_s20)
        return ct_lp0, ct_s20

    ct_lp0, ct_s20 = init_fold(ct_s2, ct_lp, ct_s2s_ref)
    dt_lp0, dt_s20 = init_fold(dt_s2, dt_lp, ctt_s2s_ref)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (ct_lp0_ref, ct_s20_ref, ct_ltv_ref, ct_lsv_ref,
                    ct_endv_ref, ct_s2v_ref, ctt_lp0_ref, ctt_s20_ref,
                    ctt_ltv_ref, ctt_lsv_ref, ctt_endv_ref, ctt_s2v_ref):
            ref[:] = jnp.zeros((K, 1), jnp.float32)
        for ref in (ct_ltn_ref, ct_s2n_ref, ct_lsn_ref, ct_endn_ref,
                    ctt_ltn_ref, ctt_s2n_ref, ctt_lsn_ref, ctt_endn_ref):
            ref[:] = jnp.zeros((K, A), jnp.float32)

    ct_lp0_ref[:] += ct_lp0
    ct_s20_ref[:] += ct_s20
    ct_ltv_ref[:] += jnp.sum(ct[3], axis=1, keepdims=True)
    ct_lsv_ref[:] += jnp.sum(ct[4], axis=1, keepdims=True)
    ct_endv_ref[:] += ct[5]
    ct_s2v_ref[:] += jnp.sum(ct[6], axis=1, keepdims=True)
    ct_ltn_ref[:] += ct[7]
    ct_s2n_ref[:] += ct[8]
    ct_lsn_ref[:] += ct[9]
    ct_endn_ref[:] += ct[10]
    ctt_lp0_ref[:] += dt_lp0
    ctt_s20_ref[:] += dt_s20
    ctt_ltv_ref[:] += jnp.sum(ct[14], axis=1, keepdims=True)
    ctt_lsv_ref[:] += jnp.sum(ct[15], axis=1, keepdims=True)
    ctt_endv_ref[:] += ct[16]
    ctt_s2v_ref[:] += jnp.sum(ct[17], axis=1, keepdims=True)
    ctt_ltn_ref[:] += ct[18]
    ctt_s2n_ref[:] += ct[19]
    ctt_lsn_ref[:] += ct[20]
    ctt_endn_ref[:] += ct[21]


def _hvp_call(static, xs, lengths_f, isbl, dargs, dargs_dot):
    T, D, K, A, G, BLK, min_len, S, P, has_len2 = static
    per_step = P > 0
    # o-major storage (pallas_grad.storage_order): permute the
    # register-indexed tables (and their tangents) in, depermute their
    # cotangent outputs; dargs[0] (l2) and dargs[11] (sig2 stream) are
    # not register-indexed
    to_s, from_s = _pg.storage_order(K, A)
    fidx, tidx = jnp.asarray(from_s), jnp.asarray(to_s)

    def perm_args(a):
        return ((a[0],)
                + tuple(jnp.take(v, fidx, axis=0) for v in a[1:11])
                + (a[11],))

    dargs = perm_args(tuple(dargs))
    dargs_dot = perm_args(tuple(dargs_dot))
    max_blk = supported_block(T, D, K, A)
    if max_blk < 128:
        raise NotImplementedError(
            f"dual carry history for T={T}, K={K} exceeds the VMEM "
            "budget — use finite differences of the gradients")
    if BLK > max_blk:
        # re-block: the dual histories are ~2x the gradient kernel's, so
        # inputs laid out for its block must be re-split
        raise NotImplementedError(
            f"block {BLK} exceeds the HVP kernel cap {max_blk}; rebuild "
            "the objective with pallas_block <= the cap")
    Bp = xs.shape[1]
    kernel = functools.partial(_hvp_kernel, T=T, D=D, K=K, A=A, G=G,
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
    darg_specs = ([track_spec] + [vec_spec] * 6 + [mat_spec] * 4
                  + [s2s_spec])
    out = pl.pallas_call(
        kernel,
        grid=(Bp // BLK,),
        in_specs=([track_spec, row_spec, row_spec]
                  + darg_specs + darg_specs),
        out_specs=([row_spec, track_spec] + [vec_spec] * 6
                   + [mat_spec] * 4 + [s2s_spec]) * 2,
        out_shape=([jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                    jax.ShapeDtypeStruct((T * D, Bp), jnp.float32)]
                   + [jax.ShapeDtypeStruct((K, 1), jnp.float32)] * 6
                   + [jax.ShapeDtypeStruct((K, A), jnp.float32)] * 4
                   + [s2s_shape]) * 2,
        scratch_shapes=[pltpu.VMEM((T - 1, D, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, D, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, D, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, D, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, D, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, D, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, K, BLK), jnp.float32),
                        pltpu.VMEM((T - 1, K // A, BLK), jnp.float32),
                        pltpu.VMEM((1, K, BLK), jnp.float32)],
        compiler_params=None if _pg.INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_pg.INTERPRET,
    )(xs, lengths_f, isbl, *dargs, *dargs_dot)

    def deperm(half):
        return (tuple(half[:2])
                + tuple(jnp.take(o, tidx, axis=0) for o in half[2:12])
                + (half[12],))

    return deperm(out[:13]) + deperm(out[13:])


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def table_grads(static, xs, lengths_f, isbl, *dargs):
    """d(sum logL)/d(kernel args): the gradient kernel's raw cotangents,
    jvp-differentiable (the tangent rule runs the dual HVP kernel)."""
    from extrack_tpu.ops.pallas_grad import _grad_call
    out = _grad_call(static, xs, dargs[0], lengths_f, isbl, *dargs[1:])
    return tuple(out[1:])


@table_grads.defjvp
def _table_grads_jvp(static, primals, tangents):
    xs, lengths_f, isbl, *dargs = primals
    _, _, _, *dargs_dot = tangents
    out = _hvp_call(static, xs, lengths_f, isbl, tuple(dargs),
                    tuple(dargs_dot))
    return tuple(out[1:13]), tuple(out[14:26])


def make_grad_z(positions, lengths, is_bleached, tables_fn, *,
                window: int = 6, nb_substeps: int = 1, min_len: int = 3,
                block: int = 512, has_len2: bool = True):
    """grad_z(z) = d(-sum logL)/dz through the Pallas backward kernel,
    jvp-TRACEABLE: jax.jvp(grad_z, (z,), (v,))[1] is the exact
    Hessian-vector product H v (the z -> kernel-args map is plain XLA;
    the kernel legs go through table_grads' custom JVP)."""
    def grad_z(z):
        tb0 = tables_fn(z)
        static, xs, lengths_f, isbl, _ = prepare_args(
            positions, lengths, is_bleached, tb0, window=window,
            nb_substeps=nb_substeps, min_len=min_len, block=block,
            has_len2=has_len2)
        # cap the block to the dual kernel's budget so the HVP leg can
        # run the same layout
        T, D, K, A = static[0], static[1], static[2], static[3]
        blk_cap = supported_block(T, D, K, A)
        if blk_cap < 128:
            raise NotImplementedError(
                "dual carry history exceeds the VMEM budget")
        if static[5] > blk_cap:
            static, xs, lengths_f, isbl, _ = prepare_args(
                positions, lengths, is_bleached, tb0, window=window,
                nb_substeps=nb_substeps, min_len=min_len, block=blk_cap,
                has_len2=has_len2)

        def argsfun(z_):
            return prepare_args(
                positions, lengths, is_bleached, tables_fn(z_),
                window=window, nb_substeps=nb_substeps, min_len=min_len,
                block=static[5], has_len2=has_len2)[4]

        dargs, vjpf = jax.vjp(argsfun, z)
        cts = table_grads(static, xs, lengths_f, isbl, *dargs)
        # kernel cotangents are d(sum logL)/darg; negate for -logL
        return -vjpf(cts)[0]

    return grad_z
