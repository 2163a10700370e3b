"""Pallas TPU kernel for the forward likelihood scan.

The XLA scan materializes its (D,K,B) carries plus ~10 intermediates to HBM
every frame; this kernel keeps the whole sequence register resident in VMEM
for all T frames and streams only the positions, making the hot path
compute-bound (HBM traffic = inputs + one scalar per track).

Register encoding: core.engine's slot semantics (newest sub-state in the
highest slot digit, oldest in the lowest) STORED o-major — slot k at
sublane row (k % A) * G + k // A (``storage_order``).  Consequences on
TPU:

  * fusing the oldest n sub-states = elementwise combination of the A
    contiguous (G, BLK) block slices (a fusion group's members share a
    row across blocks) — no strided sublane gathers,
  * branching into new sub-states = per-block stride-A subsample +
    ``pltpu.repeat`` + concat (children differ only by additive
    per-slot constant vectors),
  * every per-slot model quantity (transition chain, survival,
    displacement variance, end term, init prior) becomes a constant
    (K, 1) column vector gathered once on the host, permuted into
    storage order by the wrapper.

Configs with window < 2*nb_substeps (A does not divide G) keep the
legacy o-minor layout (mid-axis reshape gathers + plain repeat tiles).

Tracks ride the 128-wide lanes (BLK per grid step); the register rides the
sublanes.  Semantics match core.engine.forward exactly (same math, different
slot order); parity is asserted in tests/test_pallas.py.

Current scope (the fitting/benchmark hot path): log likelihood only, no
posterior outputs — those run on the XLA path.  Constant, per-step, and
per-track dt are supported (variable dt streams the displacement-variance
table through VMEM alongside the positions).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from extrack_tpu.core.tables import ModelTables

_TINY = 1e-30

# Raised Mosaic scoped-VMEM limit (v5e/v5p: 128MiB physical per core) and
# the budget used to cap block width: register scratch + the unrolled
# look-ahead's per-branch live arrays all sit in scoped VMEM.
VMEM_LIMIT = 64 * 1024 * 1024
_SCRATCH_BUDGET = 40 * 1024 * 1024


def forward_block_cap(D: int, K: int, A: int, T: int = 0,
                      P: int = 0) -> int:
    """Largest lane-multiple block whose register + look-ahead live set
    fits the forward kernel's VMEM budget.

    ``T``/``P`` account for the pipeline-double-buffered input blocks
    (xs/l2 track blocks, and the per-step displacement-variance stream
    when P > 0): without them a long-T input passes the cap check but
    overflows vmem_limit_bytes at Mosaic compile time instead of falling
    back to XLA."""
    per_lane = ((2 * D + 1) + 3 * A + 2 * D + 6) * K * 4
    per_lane += 2 * (2 * T * D + max(T - 1, 0) * P) * 4   # double-buffered
    return (_SCRATCH_BUDGET // per_lane) // 128 * 128


def _dig(k, i, S, W):
    """i-th newest window digit of slot k (digit 0 = newest, at the top)."""
    return (k // S ** (W - 1 - i)) % S


def storage_order(K: int, A: int):
    """o-major storage permutation of the register dimension.

    The slot encoding keeps the n oldest sub-step digits MINOR (slot
    k = g*A + o), so fusion groups are A interleaved consecutive rows:
    the o-reduce then needs (G, A, BLK) reshapes with stride-A sublane
    gathers (measured 783 ns per gather set at K=243/BLK=256), and
    reverse-mode assemblies need K-row interleave scatters (1148 ns
    each, scratch-laundered) — vs 142 ns for contiguous slices
    (benchmarks/grad3_probe.json).  The kernels therefore store slot k
    at row r = (k % A) * G + k // A, so a fusion group's members sit at
    the SAME row of the A contiguous (G, BLK) blocks and every per-o
    access is a contiguous block slice.  The children of fused group g
    land at rows (g % A) * G + a * (G // A) + g // A: the tile is a
    stride-A subsample + native repeat per block (requires A | G, i.e.
    window >= 2*nb_substeps; other configs keep the o-minor layout).

    Returns (to_storage, from_storage) index vectors:
    ``table_storage = table[from_storage]`` and
    ``ct_slot = ct_storage[to_storage]``.
    """
    G = K // A
    r = np.arange(K)
    from_storage = (r % G) * A + r // G
    to_storage = np.argsort(from_storage)
    return to_storage, from_storage


def _class_runs(class_of_k, K, A):
    """Run-length encoding over STORAGE rows of a per-slot class id:
    tuple of (class_id, start_row, n_rows).  Classes contiguous in slot
    order (digit prefixes: the dt pattern k // (K/P), the newest digit
    k // (K/S)) stay contiguous runs within each storage block."""
    G = K // A
    r = np.arange(K)
    c = np.asarray(class_of_k)[(r % G) * A + r // G]
    runs, s = [], 0
    for i in range(1, K + 1):
        if i == K or c[i] != c[s]:
            runs.append((int(c[s]), s, i - s))
            s = i
    return tuple(runs)


def _rfold(x, runs, n_classes):
    """(K, BLK) storage-order rows -> (n_classes, BLK) per-class sublane
    sums, via the run list (each run is one contiguous slice reduce)."""
    outs = [None] * n_classes
    for cls, st, n in runs:
        v = jnp.sum(x[st:st + n], axis=0, keepdims=True)
        outs[cls] = v if outs[cls] is None else outs[cls] + v
    return jnp.concatenate(outs, axis=0)


def _rexpand(rows_fn, runs):
    """Per-class (1, BLK) rows -> (K, BLK) storage-order table (the
    storage-layout analog of _expand_rows)."""
    parts = []
    for cls, _, n in runs:
        row = rows_fn(cls)
        parts.append(jnp.broadcast_to(row, (n, row.shape[-1])))
    return jnp.concatenate(parts, axis=0)


# the kernels' max-shifted exp-sums assume FINITE log tables (build_tables
# floors log(0) at -1e15); a hand-built ModelTables with true -inf entries
# would yield NaN (inf - inf).  The floor is re-applied here so direct
# ModelTables construction is safe on the Pallas path too.
_LOG_FLOOR = -1e15


def build_slot_tables(tables: ModelTables, window: int, nb_substeps: int):
    """(lp0, s2_init, lt, lsurv, end, sig2) as (K,) vectors in the
    newest-high slot encoding (same as core.engine)."""
    S = tables.nb_states
    W, n = window, nb_substeps
    if W < n + 1:     # same diagnostic as core.engine.make_register_spec
        raise ValueError(
            f"window ({W}) must be >= nb_substeps+1 ({n + 1})")
    K = S ** W
    k = np.arange(K)

    log_T = jnp.maximum(tables.log_trans, _LOG_FLOOR)
    # transition chain of the n newest digits: prev state = digit n,
    # chain prev -> a_{n-1} -> ... -> a_0 (digit 0 = newest)
    lt = jnp.zeros((K,), log_T.dtype)
    for j in range(n):
        lt = lt + log_T[_dig(k, j + 1, S, W), _dig(k, j, S, W)]
    lsurv = jnp.maximum(tables.log_survive, _LOG_FLOOR)[k // S ** (W - n)]
    end = jnp.maximum(tables.end_ll, _LOG_FLOOR)[_dig(k, 0, S, W)]
    sig2_row = tables.sig2.reshape(-1, tables.sig2.shape[-1])[0]
    sig2 = sig2_row[k // S ** (W - n - 1)]            # n+1 newest digits

    log_F = jnp.maximum(tables.log_frac, _LOG_FLOOR)
    lp0 = log_F[_dig(k, n, S, W)]
    for j in range(n):
        lp0 = lp0 + log_T[_dig(k, j + 1, S, W), _dig(k, j, S, W)]
    lp0 = lp0 - (W - n - 1) * np.log(S)
    return lp0, sig2, lt, lsurv, end, sig2


def build_next_tables(tables: ModelTables, window: int, nb_substeps: int):
    """(ltn, s2n, lsn, endn) as (K, A) tables for the look-ahead closing:
    column ``a`` describes the pre-fusion child of slot k under new
    sub-state pattern ``a`` (chain transitions, child displacement
    variance, survival, folded end term).  Tracks of length L >= 3 close
    against these children at step L-2, matching the reference's skipped
    last-step fusion (tracking.py:255; see core.engine docstring)."""
    S = tables.nb_states
    W, n = window, nb_substeps
    K, A = S ** W, S ** n
    k = np.arange(K)[:, None]
    a = np.arange(A)[None, :]
    newest_k = k // S ** (W - 1)

    def dig_a(i):                 # i-th newest digit of pattern a
        return (a // S ** (n - 1 - i)) % S

    log_T = jnp.maximum(tables.log_trans, _LOG_FLOOR)
    ltn = log_T[newest_k, dig_a(n - 1)]
    for j in range(n - 1):
        ltn = ltn + log_T[dig_a(j + 1), dig_a(j)]
    sig2_row = tables.sig2.reshape(-1, tables.sig2.shape[-1])[0]
    s2n = sig2_row[a * S + newest_k]                      # (K, A)
    lsn = jnp.broadcast_to(
        jnp.maximum(tables.log_survive, _LOG_FLOOR)[None, :], (K, A))
    endn = jnp.broadcast_to(
        jnp.maximum(tables.end_ll, _LOG_FLOOR)[a // S ** (n - 1)], (K, A))
    return ltn, s2n, lsn, endn


def _expand_rows(rows_fn, P, reps, BLK):
    """(P rows) -> (P*reps, BLK): each row broadcast to ``reps`` consecutive
    sublanes.  rows_fn(p) returns a (1, 1|BLK) row; the concat order matches
    the newest-high slot encoding (slots [p*reps, (p+1)*reps) share index p).
    """
    return jnp.concatenate(
        [jnp.broadcast_to(rows_fn(p), (reps, BLK)) for p in range(P)], axis=0)


def _kernel(xs_ref, l2_ref, len_ref, isbl_ref, lp0_ref, s20_ref, ltv_ref,
            lsv_ref, endv_ref, s2v_ref, ltn_ref, s2n_ref, lsn_ref, endn_ref,
            out_ref, m_sc, s2_sc, lp_sc,
            *, T, D, K, A, G, BLK, min_len, S=0, P=0):
    """Forward scan.  With S/P > 0 (variable dt), ``s20_ref``/``s2v_ref`` is
    a streamed (Tm1*P, 1|BLK) per-step displacement-variance table (pattern
    p = the n+1 newest sub-states, row t*P+p = variance of step t -> t+1)
    and ``s2n_ref`` is unused; otherwise they are (K, 1)/(K, A) constants."""
    lengths = len_ref[0, :]                      # (BLK,) int32
    isbl = isbl_ref[0, :][None, :]               # (1, BLK)
    per_step = P > 0
    # o-major storage (storage_order): fusion groups are the same row of
    # A contiguous blocks and every per-o access is a contiguous slice;
    # the rare A-does-not-divide-G configs (window < 2*nb_substeps) keep
    # the legacy o-minor layout (reshape gathers + plain repeat tiles)
    omajor = A == 1 or K // A % A == 0
    Q = K // P if per_step else 0                # reps per pattern row
    QN = K // S if per_step else 0               # reps per newest-state row
    if per_step and omajor:
        pat_runs = _class_runs(np.arange(K) // (K // P), K, A)
        new_runs = _class_runs(np.arange(K) // (K // S), K, A)
    GA = G // A if A > 1 else G

    def tile(v):
        # fused (G, BLK) -> (K, BLK) children (see storage_order)
        if A == 1:
            return v
        if not omajor:
            return pltpu.repeat(v, A, axis=0)
        sub = v.reshape(GA, A, BLK)
        return jnp.concatenate(
            [pltpu.repeat(sub[:, u], A, axis=0) for u in range(A)],
            axis=0)

    def s2_slot_table(t):
        # (K, BLK) displacement variance of step t, in register layout
        if omajor and per_step:
            return _rexpand(
                lambda p: s2v_ref[pl.ds(t * P + p, 1), :], pat_runs)
        return _expand_rows(lambda p: s2v_ref[pl.ds(t * P + p, 1), :],
                            P, Q, BLK)

    for d in range(D):
        m_sc[d] = jnp.broadcast_to(xs_ref[pl.ds(d, 1), :], (K, BLK))
        if per_step:
            s2_sc[d] = l2_ref[pl.ds(d, 1), :] + s2_slot_table(0)
        else:
            s2_sc[d] = l2_ref[pl.ds(d, 1), :] + s20_ref[:]
    lp_sc[:] = jnp.broadcast_to(lp0_ref[:], (K, BLK))

    # per-step Gaussian normalizers ride as rsqrt factors into the fusion's
    # exp-sum (one log per step saved); their 2*pi constants are folded into
    # the transition table by the wrapper (ltv -= D/2*log(2pi) per fusion)
    cl2pi = float(0.5 * D * np.log(2 * np.pi))

    # loop-invariant closing predicates: scalar length bounds replace the
    # per-step vector compare+reduce (exact for sorted same-length blocks,
    # conservative for mixed ones — a spurious fire is fully masked)
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
            x = xs_ref[pl.ds(t * D + d, 1), :]           # (1, BLK)
            l2t = l2_ref[pl.ds(t * D + d, 1), :]
            md, s2d = m_sc[d], s2_sc[d]
            tot = l2t + s2d
            rt = jax.lax.rsqrt(tot)
            inv = rt * rt
            diff = x - md
            prod *= tot
            quad += 0.5 * diff * diff * inv
            new_m[d] = (md * l2t + x * s2d) * inv
            tail[d] = l2t * s2d * inv

        # closing term for 2-frame tracks ending at t (longer tracks close
        # one step early on the pre-fusion children, matching the
        # reference's skipped last-step fusion — see core.engine).  Only
        # possible at t == 1: branch the whole computation away otherwise.
        def close_l2(_):
            lc = -0.5 * jnp.log(prod) - quad - cl2pi
            fin = lp + isbl * endv_ref[:] + lc
            mx = jnp.max(fin, axis=0, keepdims=True)
            lse = mx + jnp.log(jnp.sum(jnp.exp(fin - mx), axis=0,
                                       keepdims=True))
            return jnp.where(((t == lengths - 1)
                              & (lengths == 2))[None, :], lse, 0.0)

        acc = acc + jax.lax.cond(
            (t == 1) & any2, close_l2,
            lambda _: jnp.zeros((1, BLK), jnp.float32), None)

        # look-ahead closing: tracks ending at frame t+1.  The per-child
        # Gaussian normalizers enter as rsqrt factors on the exp side, so
        # the whole block costs ONE log; steps where no track in the block
        # ends at t+1 skip it entirely.
        gate = jnp.where(t + 1 >= min_len, 1.0, 0.0).astype(jnp.float32)

        def close_lookahead(_):
            tn = jnp.minimum(t + 1, T - 1)
            tc = jnp.minimum(t, T - 2)
            lc = -0.5 * jnp.log(prod) - quad - cl2pi
            base_n = lp + lc
            gs, rs = [], []
            mx_n = jnp.full((1, BLK), -jnp.inf, jnp.float32)
            for a in range(A):
                if per_step:
                    # child pair = (pattern a, parent newest state)
                    if omajor:
                        s2n_a = _rexpand(
                            lambda s, a=a: s2v_ref[
                                pl.ds(tc * P + a * S + s, 1), :],
                            new_runs)
                    else:
                        s2n_a = _expand_rows(
                            lambda s: s2v_ref[
                                pl.ds(tc * P + a * S + s, 1), :],
                            S, QN, BLK)
                prod_n = jnp.ones((K, BLK), jnp.float32)
                quad_n = jnp.zeros((K, BLK), jnp.float32)
                for d in range(D):
                    xn = xs_ref[pl.ds(tn * D + d, 1), :]
                    l2n = l2_ref[pl.ds(tn * D + d, 1), :]
                    totn = (s2n_a if per_step
                            else s2n_ref[:, a:a + 1]) + tail[d] + l2n
                    rn = jax.lax.rsqrt(totn)
                    diffn = xn - new_m[d]
                    prod_n *= 2 * np.pi * totn
                    quad_n += 0.5 * diffn * diffn * (rn * rn)
                g = (base_n + ltn_ref[:, a:a + 1]
                     + gate * lsn_ref[:, a:a + 1]
                     + isbl * endn_ref[:, a:a + 1] - quad_n)
                gs.append(g)
                rs.append(jax.lax.rsqrt(prod_n))
                # g >= fa (the dropped -0.5*log(prod) is bounded by the
                # rsqrt factor below), so shifting by max(g) stays stable
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

        # fuse the oldest sub-states: reduce over the A-sized middle axis
        # (groups are A consecutive rows: slot k = g*A + o, o = oldest).
        # The shift max(lp - quad) omits the bounded -0.5*log(prod) part, so
        # exp args stay <= 0 and the rsqrt factors (e^(+-15)ish) can't
        # overflow; the logsumexp value is exact for any finite shift.
        # Gated on t < lmax - 2: the carry written at the loop's final step
        # (t = lmax - 2) is only ever read at t = lmax - 1, which never
        # executes — for every lane the last interior fusion is dead work
        # (the whole fusion for 3-frame buckets).
        @pl.when(t < lmax - 2)
        def _fuse_update():
            if omajor:
                base = lp - quad
                rq = jax.lax.rsqrt(prod)
                bp = [base[o * G:(o + 1) * G] for o in range(A)]
                rp = [rq[o * G:(o + 1) * G] for o in range(A)]
            else:
                base3 = (lp - quad).reshape(G, A, BLK)
                rq3 = jax.lax.rsqrt(prod).reshape(G, A, BLK)
                bp = [base3[:, o] for o in range(A)]
                rp = [rq3[:, o] for o in range(A)]
            mxs = bp[0]
            for o in range(1, A):
                mxs = jnp.maximum(mxs, bp[o])
            w = [jnp.exp(bp[o] - mxs) * rp[o] for o in range(A)]
            sw = w[0]
            for o in range(1, A):
                sw = sw + w[o]
            inv_sw = 1.0 / jnp.maximum(sw, _TINY)
            lp_f = mxs + jnp.log(jnp.maximum(sw, _TINY))

            keep = (t < lengths - 1)[None, :]
            s2_add = (s2_slot_table(jnp.minimum(t, T - 2)) if per_step
                      else s2v_ref[:])
            for d in range(D):
                if omajor:
                    nmp = [new_m[d][o * G:(o + 1) * G] for o in range(A)]
                    tlp = [tail[d][o * G:(o + 1) * G] for o in range(A)]
                else:
                    nm3 = new_m[d].reshape(G, A, BLK)
                    tl3 = tail[d].reshape(G, A, BLK)
                    nmp = [nm3[:, o] for o in range(A)]
                    tlp = [tl3[:, o] for o in range(A)]
                m_f = w[0] * nmp[0]
                t_f = w[0] * tlp[0]
                for o in range(1, A):
                    m_f += w[o] * nmp[o]
                    t_f += w[o] * tlp[o]
                m_f *= inv_sw
                t_f *= inv_sw
                m_sc[d] = jnp.where(keep, tile(m_f), m_sc[d])
                s2_sc[d] = jnp.where(keep, s2_add + tile(t_f), s2_sc[d])
            lp_new = tile(lp_f) + ltv_ref[:] + gate * lsv_ref[:]
            lp_sc[:] = jnp.where(keep, lp_new, lp)

        return acc

    # dynamic trip count: the last useful step is the look-ahead closing at
    # t = lmax - 2 (t = lmax - 1 is fully masked — keep is false everywhere
    # and no closing fires), so uniform-length blocks skip one dead step
    # (half the loop for 3-frame tracks) and padded blocks skip the rest
    acc = jax.lax.fori_loop(1, jnp.maximum(lmax - 1, 2), body,
                            jnp.zeros((1, BLK), jnp.float32))
    out_ref[:] = acc


@functools.partial(
    jax.jit,
    static_argnames=("window", "nb_substeps", "min_len", "block",
                     "interpret"))
def forward_pallas(positions,
                   lengths,
                   is_bleached,
                   tables: ModelTables,
                   *,
                   window: int = 6,
                   nb_substeps: int = 1,
                   min_len: int = 3,
                   block: int = 512,
                   interpret: bool = False):
    """Per-track log likelihood — VMEM-resident Pallas kernel.

    Same semantics as core.engine.forward (logL path), float32.  Variable
    dt is supported: per-step ``tables.sig2 (T-1, P)`` rides along as a
    streamed VMEM table, per-track ``(B, T-1, P)`` as a lane-sharded one
    (matching the XLA engine's sig2_ag_at, core/engine.py:160-166).
    """
    B, T, D = positions.shape
    S = tables.nb_states
    W, n = window, nb_substeps
    K, A = S ** W, S ** n
    G = K // A
    P = S ** (n + 1)
    sig2 = tables.sig2
    per_step = classify_sig2(sig2, T)

    f32 = jnp.float32
    lp0, s20, lt, lsurv, end, sig2v = [
        v.astype(f32)[:, None]
        for v in build_slot_tables(tables, W, n)]
    # the kernel drops the per-step 2*pi normalizer constants; every fusion
    # adds lt, so the per-fusion constant folds here (exact)
    lt = lt - f32(0.5 * D * np.log(2 * np.pi))
    ltn, s2n, lsn, endn = [v.astype(f32)
                           for v in build_next_tables(tables, W, n)]

    if A == 1 or G % A == 0:
        # o-major storage: register-indexed tables go in permuted; the
        # output is per-lane, so nothing comes back register-indexed
        _, from_s = storage_order(K, A)
        fidx = jnp.asarray(from_s)
        lp0, s20, lt, lsurv, end, sig2v = (
            jnp.take(v, fidx, axis=0)
            for v in (lp0, s20, lt, lsurv, end, sig2v))
        ltn, s2n, lsn, endn = (jnp.take(v, fidx, axis=0)
                               for v in (ltn, s2n, lsn, endn))

    cap = forward_block_cap(D, K, A, T, P if per_step else 0)
    if cap < 128:
        raise NotImplementedError(
            f"register for K={K}, A={A} exceeds the VMEM budget — "
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

    kernel = functools.partial(_kernel, T=T, D=D, K=K, A=A, G=G, BLK=BLK,
                               min_len=min_len,
                               S=S if per_step else 0,
                               P=P if per_step else 0)
    grid = (Bp // BLK,)
    track_spec = pl.BlockSpec((T * D, BLK), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((K, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((K, A), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    if per_step:
        # streamed displacement-variance table: row t*P+p = pattern p of
        # step t -> t+1; lane-sharded when per-track, 1 column when shared
        sig2v, s2v_spec = _sig2_stream(sig2, T, P, B, Bp, BLK, f32)
    else:
        s2v_spec = vec_spec
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[track_spec, track_spec, row_spec, row_spec,
                  vec_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                  s2v_spec, mat_spec, mat_spec, mat_spec, mat_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((1, Bp), f32),
        scratch_shapes=[pltpu.VMEM((D, K, BLK), f32),
                        pltpu.VMEM((D, K, BLK), f32),
                        pltpu.VMEM((K, BLK), f32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xs, l2, lengths, isbl, lp0, s20, lt, lsurv, end, sig2v,
      ltn, s2n, lsn, endn)
    return out[0, :B]


def classify_sig2(sig2, T):
    """True when the displacement-variance table varies per STEP or per
    TRACK — either way the kernel needs the streamed lane table.  Shared by
    all four kernels.  The flat row count alone misclassified per-track dt
    at T=2: a (B, 1, P) table has ONE step row per track yet still differs
    across lanes, and the broadcast path would score every track with
    track 0's dt.  Also validates the step-row count."""
    batch = sig2.shape[0] if sig2.ndim == 3 else 1
    step_rows = sig2.reshape(-1, sig2.shape[-1]).shape[0] // batch
    if step_rows not in (1, T - 1):
        raise NotImplementedError(
            f"per-step sig2 must have T-1={T - 1} rows, got {step_rows}")
    return step_rows != 1 or batch != 1


def _sig2_stream(sig2, T, P, B, Bp, BLK, dtype):
    """(T-1, P) or (B, T-1, P) sig2 -> ((T-1)*P, Bp) lane-sharded streamed
    table + its BlockSpec.  Shared per-step tables are broadcast over the
    lane axis host-side: Mosaic can't broadcast a (1, 1) row in sublanes
    and lanes at once inside the kernel."""
    sig2 = jnp.broadcast_to(sig2.astype(dtype), (B, T - 1, P))
    tab = sig2.transpose(1, 2, 0).reshape((T - 1) * P, B)
    if Bp != B:
        tab = jnp.pad(tab, ((0, 0), (0, Bp - B)), constant_values=1.0)
    spec = pl.BlockSpec(((T - 1) * P, BLK), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return tab, spec
