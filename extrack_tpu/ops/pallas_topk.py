"""Pallas TPU kernel for the top-K pruned segment-histogram engine.

The reference's histogram recursion keeps an explicit register of the
``max_nb_states`` most probable state sequences per track, re-selected
every frame by an argsort on a one-step-lookahead posterior score
(/root/reference/extrack/histograms.py:179-206).  The XLA transcription
(histograms.segment_histogram) already replaced the reference's
take_along_axis gathers with one multi-operand ``lax.sort``, but the
sort and the (B, A*M) child arrays still round-trip HBM every scan step
— 18k tracks/s at M=512.

This kernel keeps the whole sequence register VMEM-resident (tracks on
lanes, the M sequence slots on sublanes) and replaces the sort with an
in-VMEM **bitonic compare-exchange network** along the sublane axis:
partner rows at stride j are two static ``pltpu.roll``s and the swap
decision is one pair-consistent comparison per stage, so the selection
is pure dense VPU work with no gathers and no HBM traffic.  Payload
arrays (Gaussian moments, log-probs) ride through the same network; the
branch pattern and parent slot are reconstructed from a single carried
row-index payload instead of being sorted alongside.

Semantics match histograms.segment_histogram slot for slot (same score,
same closing, same backpointer outputs) with one caveat: ``lax.sort``
is stable while a bitonic network is not, so exactly tied lookahead
scores may select a different (equally probable) sequence — measure-zero
for real data and weight-irrelevant for the -1e30 padding ties.

Layout rules (see CLAUDE.md): M on sublanes requires M % 8 == 0; the
sort width is the next power of two >= A*M (padded rows carry -3e38
keys so they sink below every live slot); per-(branch, state) constants
live in SMEM and are combined with one-hot newest-state masks (the
newest state is data-dependent here, unlike the likelihood kernels'
static slot encodings).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from extrack_tpu.core import tables as ttables
from extrack_tpu.core.tables import ModelTables, state_codes
from extrack_tpu.ops.pallas_engine import VMEM_LIMIT, classify_sig2

_NEG = -1e30          # dead-slot log prob (same as histograms._NEG)
_KPAD = -3e38         # sort-pad key: below every live score, still finite

_SCRATCH_BUDGET = 28 * 1024 * 1024


def topk_block_cap(T: int, D: int, M: int, A: int) -> int:
    """Largest lane-multiple block whose register + sort live set +
    backpointer outputs fit the VMEM budget (0 = unsupported)."""
    NS = 1 << int(np.ceil(np.log2(max(A * M, 2))))
    per_lane = ((2 * D + 3) * NS        # register/child scratch
                + 4 * NS                # sort temporaries (key+idx+partners)
                + 2 * (T - 1) * M       # parent/state outputs
                + M                     # w_final
                + 2 * T * D) * 4
    return (_SCRATCH_BUDGET // per_lane) // 128 * 128


def supports(T: int, D: int, S: int, M: int, nb_substeps: int = 1) -> bool:
    A = S ** nb_substeps
    return M % 8 == 0 and M >= S ** (nb_substeps + 1) \
        and topk_block_cap(T, D, M, A) >= 128


def bitonic_topm(key, payloads, M):
    """Descending bitonic sort of ``key`` (NS, BLK) along sublanes, the
    payload arrays shuffled alongside; returns the top-M rows of each.

    NS must be a power of two.  The swap decision is computed once per
    stage from the PAIR (x_low > x_high for ascending blocks), which is
    consistent on both sides of a tie (no swap), so payload rows are
    never duplicated or lost."""
    NS = key.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (NS, 1), 0)

    def cx(key, payloads, j, ksz):
        low = (i & j) == 0
        # block direction: descending overall flips the ascending bit
        dirm = (i & (ksz << 1)) != 0

        def partner(x):
            # x[i^j]: roll shift must be non-negative (x[i+j] = roll NS-j)
            return jnp.where(low, pltpu.roll(x, NS - j, 0),
                             pltpu.roll(x, j, 0))

        pk = partner(key)
        xl = jnp.where(low, key, pk)
        xh = jnp.where(low, pk, key)
        swap = (xl > xh) == dirm
        key = jnp.where(swap, pk, key)
        payloads = [jnp.where(swap, partner(p), p) for p in payloads]
        return key, payloads

    ksz = 1
    while ksz < NS:
        j = ksz
        while j >= 1:
            key, payloads = cx(key, payloads, j, ksz)
            j //= 2
        ksz *= 2
    return key[:M], [p[:M] for p in payloads]


def _topk_kernel(xs_ref, l2_ref, len_ref, isbl_ref, lp0_ref, s20_ref,
                 nw0_ref, tab_ref,
                 wf_ref, par_ref, st_ref,
                 m_sc, s2_sc, lp_sc, ll_sc, nw_sc,
                 *, T, D, S, A, M, NS, min_len, BLK, newest_div):
    """One grid block of BLK tracks.  SMEM ``tab_ref`` packs the
    per-(branch, state) scalars: rows [0, A*S) = lt[a, s] (transition
    chain of pattern a from newest state s), [A*S, A*S+A) = lsurv[a],
    then end[s] (S rows) and sig2[a*S+s] (A*S rows)."""
    lengths = len_ref[0, :]
    isbl = isbl_ref[0, :][None, :]
    off_lt, off_sv = 0, A * S
    off_end, off_s2 = A * S + A, A * S + A + S

    # ---- init: the P two-frame patterns in the first rows --------------
    for d in range(D):
        m_sc[d, :M] = jnp.broadcast_to(xs_ref[pl.ds(d, 1), :], (M, BLK))
        s2_sc[d, :M] = l2_ref[pl.ds(d, 1), :] + s20_ref[:]
    lp_sc[:M] = jnp.broadcast_to(lp0_ref[:], (M, BLK))
    ll_sc[:M] = jnp.zeros((M, BLK), jnp.float32)
    nw_sc[:M] = jnp.broadcast_to(nw0_ref[:], (M, BLK))
    wf_ref[:] = jnp.zeros((M, BLK), jnp.float32)

    # Mosaic's tpu.iota is integer-only: build i32 and cast
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (M, BLK), 0) \
        .astype(jnp.float32)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (NS, BLK), 0) \
        .astype(jnp.float32)
    c2pi = float(np.log(2 * np.pi))

    def body(t, _):
        m = [m_sc[d, :M] for d in range(D)]
        s2 = [s2_sc[d, :M] for d in range(D)]
        lp, ll, nw = lp_sc[:M], ll_sc[:M], nw_sc[:M]

        # one-hot masks of the data-dependent newest state
        sel = [jnp.where(nw == float(s), 1.0, 0.0) for s in range(S)]

        def onehot(base, a=None):
            v = sel[0] * tab_ref[base + (a * S if a is not None else 0), 0]
            for s in range(1, S):
                v = v + sel[s] * tab_ref[
                    base + (a * S if a is not None else 0) + s, 0]
            return v

        # observation at frame t: Gaussian fold shared by the closing
        # and the branch (histograms.py:121-133)
        lc = jnp.zeros((M, BLK), jnp.float32)
        new_m, tail = [None] * D, [None] * D
        for d in range(D):
            x = xs_ref[pl.ds(t * D + d, 1), :]
            l2t = l2_ref[pl.ds(t * D + d, 1), :]
            tot = l2t + s2[d]
            inv = 1.0 / tot
            diff = x - m[d]
            lc = lc - 0.5 * (jnp.log(tot) + c2pi) \
                - 0.5 * diff * diff * inv
            new_m[d] = (m[d] * l2t + x * s2[d]) * inv
            tail[d] = l2t * s2[d] * inv

        # closing weights for tracks ending at t (softmax over the M
        # live rows; padded slots carry lp = -1e30 and vanish)
        fin = lp + ll + isbl * onehot(off_end) + lc
        mx = jnp.max(fin, axis=0, keepdims=True)
        w = jnp.exp(fin - mx)
        w = w / jnp.maximum(jnp.sum(w, axis=0, keepdims=True), 1e-30)
        is_final = (t == lengths - 1)[None, :]
        wf_ref[:] = wf_ref[:] + jnp.where(is_final, w, 0.0)

        # branch children: block a = rows [a*M, (a+1)*M); child moments
        # are parent quantities (shared across a), the variance offset,
        # transition chain and survival differ per block
        gate = jnp.where(t + 1 >= min_len, 1.0, 0.0).astype(jnp.float32)
        tn = jnp.minimum(t + 1, T - 1)
        lp_base = lp + lc
        key_parts, s2_parts, lp_parts, ll_parts = [], [], [], []
        for a in range(A):
            s2_a = [onehot(off_s2, a) + tail[d] for d in range(D)]
            lp_a = lp_base + onehot(off_lt, a)
            ll_a = ll + gate * tab_ref[off_sv + a, 0]
            # lookahead score: next-frame observation integral
            # (histograms.py:151-155)
            look = lp_a
            for d in range(D):
                xn = xs_ref[pl.ds(tn * D + d, 1), :]
                l2n = l2_ref[pl.ds(tn * D + d, 1), :]
                totn = l2n + s2_a[d]
                dn = xn - new_m[d]
                look = look - 0.5 * (jnp.log(totn) + c2pi) \
                    - 0.5 * dn * dn / totn
            key_parts.append(look)
            s2_parts.append(s2_a)
            lp_parts.append(lp_a)
            ll_parts.append(ll_a)

        def padcat(parts, fill):
            v = jnp.concatenate(parts, axis=0)
            if NS > A * M:
                v = jnp.concatenate(
                    [v, jnp.full((NS - A * M, BLK), fill, jnp.float32)],
                    axis=0)
            return v

        key = padcat(key_parts, _KPAD)
        payloads = ([padcat([new_m[d]] * A, 0.0) for d in range(D)]
                    + [padcat([s2_parts[a][d] for a in range(A)], 1.0)
                       for d in range(D)]
                    + [padcat(lp_parts, _NEG), padcat(ll_parts, 0.0),
                       iota_n])

        key_s, sel_rows = bitonic_topm(key, payloads, M)
        m_new = sel_rows[:D]
        s2_new = sel_rows[D:2 * D]
        lp_new, ll_new, idx = sel_rows[2 * D], sel_rows[2 * D + 1], \
            sel_rows[2 * D + 2]

        # branch pattern / parent slot from the carried row index
        a_sel = jnp.floor(idx * (1.0 / M))
        parent = idx - a_sel * M
        nw_new = jnp.floor(a_sel * (1.0 / newest_div))

        keep = (t < lengths - 1)[None, :]
        for d in range(D):
            m_sc[d, :M] = jnp.where(keep, m_new[d], m[d])
            s2_sc[d, :M] = jnp.where(keep, s2_new[d], s2[d])
        lp_sc[:M] = jnp.where(keep, lp_new, lp)
        ll_sc[:M] = jnp.where(keep, ll_new, ll)
        nw_sc[:M] = jnp.where(keep, nw_new, nw)

        # backpointer outputs (frozen lanes record identity parents so
        # the final-slot assignment survives — histograms.py:177-183)
        par_ref[pl.ds((t - 1) * M, M)] = jnp.where(keep, parent, iota_m)
        st_ref[pl.ds((t - 1) * M, M)] = jnp.where(keep, nw_new, nw)
        return 0

    jax.lax.fori_loop(1, T, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("max_nb_states", "min_len", "nb_substeps", "block",
                     "interpret"))
def segment_topk_pallas(positions, lengths, is_bleached, tb: ModelTables,
                        *, max_nb_states: int = 512, min_len: int = 3,
                        nb_substeps: int = 1, block: int = 128,
                        interpret: bool = False):
    """VMEM-resident top-K pruned segment histogram.

    Returns (T, S) expected segment counts — same contract as
    histograms.segment_histogram, computed from the kernel's
    (w_final, parents, states) outputs by the shared backtracking
    decode.  Constant dt only (callers gate on classify_sig2)."""
    from extrack_tpu import histograms as thist

    B, T, D = positions.shape
    S = tb.nb_states
    n = nb_substeps
    A = S ** n
    P = S ** (n + 1)
    M = max_nb_states
    if M % 8 != 0 or M < P:
        raise NotImplementedError(
            f"max_nb_states must be a multiple of 8 and >= {P}, got {M}")
    if classify_sig2(tb.sig2, T):
        raise NotImplementedError(
            "variable dt requires the XLA topk engine")
    NS = 1 << int(np.ceil(np.log2(A * M)))
    f32 = jnp.float32
    newest_div = S ** (n - 1)

    pairs = state_codes(S, n + 1)                       # (P, n+1)
    lp0 = ttables.init_log_prob(tb.log_trans, tb.log_frac, n)
    lp0_col = jnp.pad(lp0.astype(f32), (0, M - P),
                      constant_values=_NEG)[:, None]
    sig2_row = tb.sig2.reshape(-1, tb.sig2.shape[-1])[0].astype(f32)
    s20_col = jnp.pad(sig2_row, (0, M - P), constant_values=1.0)[:, None]
    nw0_col = jnp.pad(jnp.asarray(pairs[:, 0], f32), (0, M - P))[:, None]

    lt_tab = ttables.branch_log_trans(tb.log_trans, n).astype(f32)  # (A,S)
    lsurv = tb.log_survive.astype(f32)                  # (A,)
    end_k = tb.end_ll.astype(f32)                       # (S,)
    tab = jnp.concatenate([lt_tab.reshape(-1), lsurv, end_k, sig2_row])
    tab = jnp.pad(tab, (0, (-tab.shape[0]) % 8))[:, None]

    cap = topk_block_cap(T, D, M, A)
    if cap < 128:
        raise NotImplementedError(
            f"top-K register M={M}, A={A}, T={T} exceeds the VMEM budget")
    BLK = min(block, cap, max(128, 1 << (B - 1).bit_length()))
    Bp = int(np.ceil(B / BLK)) * BLK
    l2 = jnp.broadcast_to(tb.loc_err2.astype(f32), (B, T, D))
    xs = positions.astype(f32).transpose(1, 2, 0).reshape(T * D, B)
    l2 = l2.transpose(1, 2, 0).reshape(T * D, B)
    if Bp != B:
        xs = jnp.pad(xs, ((0, 0), (0, Bp - B)))
        l2 = jnp.pad(l2, ((0, 0), (0, Bp - B)), constant_values=1.0)
        lengths = jnp.pad(lengths, (0, Bp - B))
        is_bleached = jnp.pad(is_bleached, (0, Bp - B))
    len_f = lengths.astype(f32)[None, :]
    isbl = is_bleached.astype(f32)[None, :]

    kernel = functools.partial(
        _topk_kernel, T=T, D=D, S=S, A=A, M=M, NS=NS, min_len=min_len,
        BLK=BLK, newest_div=newest_div)
    grid = (Bp // BLK,)
    track_spec = pl.BlockSpec((T * D, BLK), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((M, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_specs = (
        pl.BlockSpec((M, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(((T - 1) * M, BLK), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(((T - 1) * M, BLK), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    )
    wf, par, st = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[track_spec, track_spec, row_spec, row_spec,
                  col_spec, col_spec, col_spec, smem_spec],
        out_specs=out_specs,
        out_shape=(jax.ShapeDtypeStruct((M, Bp), f32),
                   jax.ShapeDtypeStruct(((T - 1) * M, Bp), f32),
                   jax.ShapeDtypeStruct(((T - 1) * M, Bp), f32)),
        scratch_shapes=[pltpu.VMEM((D, NS, BLK), f32),
                        pltpu.VMEM((D, NS, BLK), f32),
                        pltpu.VMEM((NS, BLK), f32),
                        pltpu.VMEM((NS, BLK), f32),
                        pltpu.VMEM((NS, BLK), f32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xs, l2, len_f, isbl, lp0_col, s20_col, nw0_col, tab)

    w_final = wf[:, :B].T                                   # (B, M)
    parents = par.reshape(T - 1, M, Bp)[..., :B].transpose(
        0, 2, 1).astype(jnp.int32)
    states = st.reshape(T - 1, M, Bp)[..., :B].transpose(
        0, 2, 1).astype(jnp.int8)
    return thist.decode_backpointers(parents, states, w_final,
                                     lengths[:B], pairs, S, M)
