"""Pallas TPU kernel for position refinement (moment-matched outputs).

The XLA refinement path (refine.position_mixtures) materializes per-step
forward AND backward registers ``(B, T, K, D)`` to HBM and then forms the
S*(K/S)^2-component pairwise mixture as full arrays — the same HBM
round-trips the forward/posterior/histogram kernels eliminated.  This kernel
keeps both registers resident in VMEM and reduces the pairwise mixture to
its moment-matched mean/variance on the fly, streaming out only
``(mu, sigma)`` per localization.

Semantics match refine.refine_positions exactly (reference
position_refinement, extrack/refined_localization.py:304-338): per position,
a mixture over state-matched (prefix-slot, suffix-slot) pairs of the
3-Gaussian product prefix x obs x suffix; track ends use 2-Gaussian products
of the single available side.

Structure (one kernel invocation per lane block of BLK tracks):

  1. *suffix pass*: the prefix scan run on statically flipped rows
     (row ``T-1-t``), with a per-lane re-initialization at each track's
     last frame (tracks of different lengths start at different flipped
     rows) — no per-lane gathers anywhere.  Each step's register
     (m, s2, lp) is stashed to VMEM scratch ((T*K, BLK) per quantity).
  2. *prefix pass*: the forward scan; before each update, the live prefix
     register is combined with the stashed suffix register of the same
     position and the observation.

The pairwise combine uses the precision (information) form of the Gaussian
product, centered at the observation: with a = m - x, p = 1/v,
P = p1 + p2 + 1/l2 and N = a1 p1 + a2 p2, each pair's weight is

    w = exp(lp1 - qq1/2 + lp2 - qq2/2 + N^2/(2P))
        * rsqrt(prod_d v1_d * v2_d * P_d)                (qq = sum_d a^2 p)

— no per-pair logs; factors common to every pair of a position (the 2*pi
powers, the obs normalizer) cancel in the moment match and are dropped.
Pairs stream in (KS*JB, BLK) chunks with flash-style running-max rescaling
of the (SW, SWM, SWV) accumulators.

Scope: ANY state count (odd K included), any D, per-peak LocErr supported
(l2 streams per position like the positions themselves).  Odd-K models
(S=3: K = 3**W) are served without padded slots by keeping every
dynamically-indexed axis OFF the sublanes: the suffix stash is a
time-leading 4D scratch (T, D, K, BLK) indexed by untiled leading axis
(Mosaic needs 8-aligned starts only for multi-row sublane slices), and the
pair chunking walks state blocks in a STATIC S-loop (static odd-offset
slices legalize; the dynamic chunk cursor only ever does single-row
loads).  JB is the largest divisor of K/S <= 16, so chunks never straddle
a state block.  Drivers fall back to the XLA path only on VMEM overflow.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from extrack_tpu.ops.pallas_engine import VMEM_LIMIT, _expand_rows

_TINY = 1e-30
_NEG = -1e30

_SCRATCH_BUDGET = 40 * 1024 * 1024


def pick_jb(KS: int) -> int:
    """Largest pair-chunk height <= 16 that divides K/S (chunks must not
    straddle a state block; 16 = two sublane tiles keeps the live set
    small while amortizing the per-chunk row loads)."""
    for j in range(min(16, KS), 0, -1):
        if KS % j == 0:
            return j
    return 1


def refine_block_cap(T: int, D: int, K: int, KS: int, JB: int) -> int:
    """Largest lane-multiple block whose stash + register + combine live
    set fits the VMEM budget."""
    per_lane = 4 * ((2 * D + 1) * T * K        # suffix stash
                    + (2 * D + 1) * K          # live register
                    + (4 * D + 4) * K          # combine precomputes
                    + 14 * KS * JB             # pair-chunk live set
                    + 6 * K)                   # end products + slop
    return (_SCRATCH_BUDGET // per_lane) // 128 * 128


def build_refine_tables(log_trans, sig2_states, W: int):
    """(lp0, lt, sig2_slot) as (K,) vectors in the newest-high encoding.

    Refinement weights carry transition terms only — no fractions,
    survival, or bleaching (reference get_LC_Km_Ks accumulates LT+LC only,
    refined_localization.py:93-96)."""
    S = log_trans.shape[0]
    K = S ** W
    k = np.arange(K)
    d0 = (k // S ** (W - 1)) % S          # newest digit
    d1 = (k // S ** (W - 2)) % S          # second-newest digit
    lt = log_trans[d1, d0]
    sig2 = 0.5 * (sig2_states[d1] + sig2_states[d0])
    lp0 = lt - (W - 2) * np.log(S)
    return lp0, lt, sig2


def _kernel(xs_ref, l2_ref, len_ref, lp0f_ref, ltf_ref, lp0r_ref, ltr_ref,
            s2v_ref, mu_ref, sig_ref,
            rm_sc, rs2_sc, rlp_sc, sm_sc, ss2_sc, slp_sc,
            pp1_sc, n1_sc, b1_sc, r1_sc, p2_sc, n2_sc, b2_sc, r2_sc,
            *, T, D, K, S, KS, JB, BLK):
    lengths = len_ref[0, :]                       # (BLK,) int32
    G = K // S

    def scan_update(t_row, lt_ref, keep):
        """Inject x at data row ``t_row``, fuse oldest digit, branch; write
        the register back under ``keep`` (1, BLK)."""
        lp = rlp_sc[:]
        prod = jnp.ones((K, BLK), jnp.float32)
        quad = jnp.zeros((K, BLK), jnp.float32)
        new_m = [None] * D
        tail = [None] * D
        for d in range(D):
            x = xs_ref[pl.ds(t_row * D + d, 1), :]
            l2t = l2_ref[pl.ds(t_row * D + d, 1), :]
            md, s2d = rm_sc[d], rs2_sc[d]
            tot = l2t + s2d
            inv = 1.0 / tot
            diff = x - md
            prod *= tot                       # 2*pi constants cancel
            quad += 0.5 * diff * diff * inv
            new_m[d] = (md * l2t + x * s2d) * inv
            tail[d] = l2t * s2d * inv
        lc = -0.5 * jnp.log(prod) - quad
        score3 = (lp + lc).reshape(G, S, BLK)
        mxs = score3[:, 0]
        for o in range(1, S):
            mxs = jnp.maximum(mxs, score3[:, o])
        w = [jnp.exp(score3[:, o] - mxs) for o in range(S)]
        sw = w[0]
        for o in range(1, S):
            sw = sw + w[o]
        inv_sw = 1.0 / jnp.maximum(sw, _TINY)
        lp_f = mxs + jnp.log(jnp.maximum(sw, _TINY))
        for d in range(D):
            nm3 = new_m[d].reshape(G, S, BLK)
            tl3 = tail[d].reshape(G, S, BLK)
            m_f = w[0] * nm3[:, 0]
            t_f = w[0] * tl3[:, 0]
            for o in range(1, S):
                m_f += w[o] * nm3[:, o]
                t_f += w[o] * tl3[:, o]
            m_f *= inv_sw
            t_f *= inv_sw
            rm_sc[d] = jnp.where(keep, pltpu.repeat(m_f, S, axis=0),
                                 rm_sc[d])
            rs2_sc[d] = jnp.where(
                keep, s2v_ref[:] + pltpu.repeat(t_f, S, axis=0), rs2_sc[d])
        rlp_sc[:] = jnp.where(keep,
                              pltpu.repeat(lp_f, S, axis=0) + lt_ref[:], lp)

    def init_register(t_row, lp0_ref, mask):
        """Re-initialize the register from the observation at ``t_row``
        on lanes where ``mask`` (1, BLK) holds."""
        for d in range(D):
            x = xs_ref[pl.ds(t_row * D + d, 1), :]
            l2t = l2_ref[pl.ds(t_row * D + d, 1), :]
            rm_sc[d] = jnp.where(mask, jnp.broadcast_to(x, (K, BLK)),
                                 rm_sc[d])
            rs2_sc[d] = jnp.where(mask, l2t + s2v_ref[:], rs2_sc[d])
        rlp_sc[:] = jnp.where(mask, jnp.broadcast_to(lp0_ref[:], (K, BLK)),
                              rlp_sc[:])

    # zero-init the outputs: the passes below only write rows t < lmax, so
    # blocks whose longest track is shorter than T would otherwise return
    # uninitialized VMEM in the padded rows (interpret mode zero-fills,
    # real TPUs do not)
    mu_ref[:] = jnp.zeros((T * D, BLK), jnp.float32)
    sig_ref[:] = jnp.zeros((T * D, BLK), jnp.float32)

    # ---- pass 1: suffix scan on flipped rows, registers stashed ----------
    for d in range(D):
        rm_sc[d] = jnp.zeros((K, BLK), jnp.float32)
        rs2_sc[d] = jnp.ones((K, BLK), jnp.float32)
    rlp_sc[:] = jnp.zeros((K, BLK), jnp.float32)

    def suffix_body(t, _):
        # time-leading stash: dynamic index rides the untiled leading axis,
        # so odd K needs no 8-aligned sublane starts
        sm_sc[pl.ds(t, 1)] = rm_sc[:][None]
        ss2_sc[pl.ds(t, 1)] = rs2_sc[:][None]
        slp_sc[pl.ds(t, 1)] = rlp_sc[:][None]
        t_row = T - 1 - t                          # flipped data row
        started = (t > T - lengths)[None, :]       # past this track's start
        scan_update(t_row, ltr_ref, started)
        init_register(t_row, lp0r_ref, (t == T - lengths)[None, :])
        return 0

    # dynamic trip range: before t = T - lmax nothing has started (stores
    # rewrite an untouched register; updates are fully masked) and the
    # prefix pass below never reads those stash rows
    lmax = jnp.max(lengths)
    jax.lax.fori_loop(T - lmax, T, suffix_body, 0)

    # ---- helpers for the combine ------------------------------------------
    def end_product(t_row, m_refs, s2_refs, lp_val):
        """Moment match of the obs x single-side 2-Gaussian products over
        all K slots.  Returns (sw (1,BLK), swm [D], swv [D]) centered at x."""
        quad = jnp.zeros((K, BLK), jnp.float32)
        prod = jnp.ones((K, BLK), jnp.float32)
        mu_c = [None] * D
        var_c = [None] * D
        for d in range(D):
            x = xs_ref[pl.ds(t_row * D + d, 1), :]
            l2t = l2_ref[pl.ds(t_row * D + d, 1), :]
            s2d = s2_refs(d)
            a = m_refs(d) - x
            tot = l2t + s2d
            inv = 1.0 / tot
            quad += 0.5 * a * a * inv
            prod *= tot
            mu_c[d] = a * l2t * inv
            var_c[d] = s2d * l2t * inv
        arg = lp_val - quad
        mx = jnp.max(arg, axis=0, keepdims=True)
        w = jnp.exp(arg - mx) * jax.lax.rsqrt(prod)
        sw = jnp.sum(w, axis=0, keepdims=True)
        swm = [jnp.sum(w * mu_c[d], axis=0, keepdims=True) for d in range(D)]
        swv = [jnp.sum(w * var_c[d], axis=0, keepdims=True) for d in range(D)]
        return sw, swm, swv

    def combine_interior(t):
        """Pairwise state-matched mixture at position t (>=1): prefix
        register (live) x suffix register (stash slot T-1-t) x obs.
        Returns (sw, swm [D], swv [D]) centered at x."""
        suf_m = sm_sc[pl.ds(T - 1 - t, 1)][0]      # (D, K, BLK)
        suf_s2 = ss2_sc[pl.ds(T - 1 - t, 1)][0]
        # per-side precomputes, written to scratch for chunked slicing
        b1 = rlp_sc[:]
        prod1 = jnp.ones((K, BLK), jnp.float32)
        b2 = slp_sc[pl.ds(T - 1 - t, 1)][0]
        prod2 = jnp.ones((K, BLK), jnp.float32)
        for d in range(D):
            x = xs_ref[pl.ds(t * D + d, 1), :]
            l2t = l2_ref[pl.ds(t * D + d, 1), :]
            px = 1.0 / l2t
            v1 = rs2_sc[d]
            p1 = 1.0 / v1
            a1 = rm_sc[d] - x
            n1 = a1 * p1
            b1 = b1 - 0.5 * a1 * n1
            prod1 *= v1
            pp1_sc[d] = p1 + px
            n1_sc[d] = n1
            v2 = suf_s2[d]
            p2 = 1.0 / v2
            a2 = suf_m[d] - x
            n2 = a2 * p2
            b2 = b2 - 0.5 * a2 * n2
            prod2 *= v2
            p2_sc[d] = p2
            n2_sc[d] = n2
        b1_sc[:] = b1
        r1_sc[:] = jax.lax.rsqrt(prod1)
        b2_sc[:] = b2
        r2_sc[:] = jax.lax.rsqrt(prod2)

        zero = jnp.zeros((1, BLK), jnp.float32)
        carry = (jnp.full((1, BLK), _NEG, jnp.float32), zero,
                 [zero] * D, [zero] * D)
        # STATIC state loop: the prefix state block [m*KS, (m+1)*KS) is a
        # static (odd-offset-safe) slice hoisted out of the chunk scan,
        # and the dynamic chunk cursor below only does single-row loads —
        # the two moves that make odd K legal on Mosaic
        for m in range(S):
            p1t = [pltpu.repeat(pp1_sc[d, m * KS:(m + 1) * KS, :], JB,
                                axis=0) for d in range(D)]
            n1t = [pltpu.repeat(n1_sc[d, m * KS:(m + 1) * KS, :], JB,
                                axis=0) for d in range(D)]
            b1t = pltpu.repeat(b1_sc[m * KS:(m + 1) * KS, :], JB, axis=0)
            r1t = pltpu.repeat(r1_sc[m * KS:(m + 1) * KS, :], JB, axis=0)

            def chunk(c, carry, m=m, p1t=p1t, n1t=n1t, b1t=b1t, r1t=r1t):
                mx, sw, swm, swv = carry
                j0 = m * KS + c * JB
                exp2 = lambda ref2d: _expand_rows(  # noqa: E731
                    lambda u: ref2d[pl.ds(j0 + u, 1), :], JB, KS, BLK)
                exp3 = lambda ref3d, d: _expand_rows(  # noqa: E731
                    lambda u: ref3d[d, pl.ds(j0 + u, 1), :], JB, KS, BLK)
                arg = b1t + exp2(b2_sc)
                prodP = jnp.ones((KS * JB, BLK), jnp.float32)
                mu_c = [None] * D
                invP = [None] * D
                for d in range(D):
                    P = p1t[d] + exp3(p2_sc, d)
                    N = n1t[d] + exp3(n2_sc, d)
                    iP = 1.0 / P
                    mu = N * iP
                    arg += 0.5 * N * mu
                    prodP *= P
                    mu_c[d] = mu
                    invP[d] = iP
                mx_new = jnp.maximum(mx,
                                     jnp.max(arg, axis=0, keepdims=True))
                scale = jnp.exp(mx - mx_new)
                w = (jnp.exp(arg - mx_new) * jax.lax.rsqrt(prodP)
                     * r1t * exp2(r2_sc))
                sw = sw * scale + jnp.sum(w, axis=0, keepdims=True)
                swm = [swm[d] * scale
                       + jnp.sum(w * mu_c[d], axis=0, keepdims=True)
                       for d in range(D)]
                swv = [swv[d] * scale
                       + jnp.sum(w * invP[d], axis=0, keepdims=True)
                       for d in range(D)]
                return mx_new, sw, swm, swv

            carry = jax.lax.fori_loop(0, KS // JB, chunk, carry)
        _, sw, swm, swv = carry
        return sw, swm, swv

    def write_out(t, sw, swm, swv, valid):
        inv = 1.0 / jnp.maximum(sw, _TINY)
        for d in range(D):
            x = xs_ref[pl.ds(t * D + d, 1), :]
            mu_ref[pl.ds(t * D + d, 1), :] = jnp.where(
                valid, x + swm[d] * inv, 0.0)
            sig_ref[pl.ds(t * D + d, 1), :] = jnp.where(
                valid, jnp.sqrt(jnp.maximum(swv[d] * inv, 0.0)), 0.0)

    # ---- pass 2: prefix scan + combine ------------------------------------
    init_register(0, lp0f_ref, jnp.full((1, BLK), True))

    # position 0: suffix-only product (stash slot T-1)
    suf_m0 = sm_sc[pl.ds(T - 1, 1)][0]
    suf_s20 = ss2_sc[pl.ds(T - 1, 1)][0]
    sw0, swm0, swv0 = end_product(
        0, lambda d: suf_m0[d], lambda d: suf_s20[d],
        slp_sc[pl.ds(T - 1, 1)][0])
    write_out(0, sw0, swm0, swv0, (lengths > 0)[None, :])

    def prefix_body(t, _):
        # ends: obs x prefix prior (selected on lanes where t == len-1)
        sw_e, swm_e, swv_e = end_product(
            t, lambda d: rm_sc[d], lambda d: rs2_sc[d], rlp_sc[:])
        sw_i, swm_i, swv_i = combine_interior(t)
        is_last = (t == lengths - 1)[None, :]
        sw = jnp.where(is_last, sw_e, sw_i)
        swm = [jnp.where(is_last, swm_e[d], swm_i[d]) for d in range(D)]
        swv = [jnp.where(is_last, swv_e[d], swv_i[d]) for d in range(D)]
        write_out(t, sw, swm, swv, (t < lengths)[None, :])
        scan_update(t, ltf_ref, (t < lengths - 1)[None, :])
        return 0

    # dynamic trip count: the last written position is t = lmax - 1
    jax.lax.fori_loop(1, jnp.maximum(lmax, 1), prefix_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("window", "block", "interpret"))
def refine_pallas(positions,
                  lengths,
                  loc_err2,
                  log_trans,
                  sig2_states,
                  *,
                  window: int = 7,
                  block: int = 256,
                  interpret: bool = False):
    """(mu (B,T,D), sigma (B,T,D)) — VMEM-resident refinement kernel.

    Same semantics as refine.refine_positions, float32.  ``loc_err2`` may
    be scalar-like or per-peak (B, T, D).
    """
    B, T, D = positions.shape
    S = log_trans.shape[0]
    W = window
    K = S ** W
    KS = K // S
    JB = pick_jb(KS)

    f32 = jnp.float32
    lp0f, ltf, s2v = build_refine_tables(log_trans, sig2_states, W)
    lp0r, ltr, _ = build_refine_tables(log_trans.T, sig2_states, W)
    col = lambda v: jnp.asarray(v, f32)[:, None]  # noqa: E731

    cap = refine_block_cap(T, D, K, KS, JB)
    if cap < 128:
        raise NotImplementedError(
            f"refine stash for T={T}, K={K} exceeds the VMEM budget — "
            "use the XLA path")
    BLK = min(block, cap, max(128, 1 << (B - 1).bit_length()))
    Bp = int(np.ceil(B / BLK)) * BLK
    l2 = jnp.broadcast_to(jnp.asarray(loc_err2, f32), (B, T, D))
    xs = positions.astype(f32).transpose(1, 2, 0).reshape(T * D, B)
    l2 = l2.transpose(1, 2, 0).reshape(T * D, B)
    if Bp != B:
        xs = jnp.pad(xs, ((0, 0), (0, Bp - B)))
        l2 = jnp.pad(l2, ((0, 0), (0, Bp - B)), constant_values=1.0)
        lengths = jnp.pad(lengths, (0, Bp - B))
    lengths = lengths.astype(jnp.int32)[None, :]

    kernel = functools.partial(_kernel, T=T, D=D, K=K, S=S, KS=KS, JB=JB,
                               BLK=BLK)
    grid = (Bp // BLK,)
    track_spec = pl.BlockSpec((T * D, BLK), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((K, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    mu, sig = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[track_spec, track_spec, row_spec,
                  vec_spec, vec_spec, vec_spec, vec_spec, vec_spec],
        out_specs=[track_spec, track_spec],
        out_shape=[jax.ShapeDtypeStruct((T * D, Bp), f32),
                   jax.ShapeDtypeStruct((T * D, Bp), f32)],
        scratch_shapes=[pltpu.VMEM((D, K, BLK), f32),      # live register
                        pltpu.VMEM((D, K, BLK), f32),
                        pltpu.VMEM((K, BLK), f32),
                        pltpu.VMEM((T, D, K, BLK), f32),   # suffix stash
                        pltpu.VMEM((T, D, K, BLK), f32),
                        pltpu.VMEM((T, K, BLK), f32),
                        pltpu.VMEM((D, K, BLK), f32),      # precomputes
                        pltpu.VMEM((D, K, BLK), f32),
                        pltpu.VMEM((K, BLK), f32),
                        pltpu.VMEM((K, BLK), f32),
                        pltpu.VMEM((D, K, BLK), f32),
                        pltpu.VMEM((D, K, BLK), f32),
                        pltpu.VMEM((K, BLK), f32),
                        pltpu.VMEM((K, BLK), f32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xs, l2, lengths, col(lp0f), col(ltf), col(lp0r), col(ltr), col(s2v))
    to_btd = lambda a: a.reshape(T, D, Bp).transpose(2, 0, 1)  # noqa: E731
    return to_btd(mu)[:B], to_btd(sig)[:B]
