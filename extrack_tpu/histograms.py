"""State-duration (segment-length) histograms.

Equivalent of the reference histogram engine (extrack/histograms.py:26-457):
the posterior-weighted distribution of consecutive same-state segment lengths
— a non-Markovian diagnostic of the fitted model.

TPU redesign — two engines:

* ``window_segment_histogram`` (default): sort-free fixed-window DP.  The
  likelihood engine's K = S**window sequence register is augmented with a
  per-slot run-length distribution and a per-slot histogram of completed
  segments, transported through the same moment-match fusions.  Exact when
  window >= track length; no top-k, no sequence materialization — pure
  dense VPU work (the reference's argsort pruning is a lane-gather-heavy
  pattern that runs ~35x slower on TPU).
* ``segment_histogram``: faithful port of the reference pruning rule —
  a *static* register of ``max_nb_states`` explicit sequences inside a
  ``lax.scan``: branch xS, Gaussian update, then ``jax.lax.top_k`` on the
  same one-step-lookahead posterior score the reference sorts by
  (extrack/histograms.py:194-206).  Unused slots carry -inf weight, so
  results are exact until the true sequence count exceeds the register.
  Segment decoding (histograms.py:253-284) is a vectorized cummax over
  end markers plus one scatter-add — no per-sequence Python loops.

Known deviations from the reference (documented, deliberate):
* pruning also applies at the last interior step (the reference skips it
  there, histograms.py:178);
* the end-of-track term uses the tracking-module formulation
  (transition-weighted fold, extrack/tracking.py:624-631) — the histogram
  module's own variant indexes its survival table inconsistently for the
  extension states (histograms.py:225) and misaligns LL during pruning
  (histograms.py:200, takes the tail of the argsort instead of the head);
* full-track-length segments are counted (the reference's histogram loop
  stops one short of them, histograms.py:279).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


from extrack_tpu import data as tdata
from extrack_tpu import params as tparams
from extrack_tpu.core import engine
from extrack_tpu.core import tables as ttables
from extrack_tpu.core.tables import ModelTables, state_codes

_NEG = -1e30


@functools.partial(jax.jit,
                   static_argnames=("max_nb_states", "min_len",
                                    "nb_substeps"))
def segment_histogram(positions, lengths, is_bleached, tb: ModelTables,
                      *, max_nb_states: int = 512, min_len: int = 3,
                      nb_substeps: int = 1):
    """Posterior-weighted segment-length histogram.

    Returns (T, S): row k-1 is the expected number of segments of length k
    in each state, summed over tracks (per-track posterior normalized, as in
    histograms.py:280-284).  With ``nb_substeps`` = n > 1 each frame step
    branches over all S**n hidden sub-state patterns (the reference
    P_segment_len supports sub-steps in its recursion,
    extrack/histograms.py:26,64-145); segment decoding stays at frame
    resolution (DEVIATIONS.md 3b) — ``tb`` must be built with the same
    nb_substeps.
    """
    B, T, D = positions.shape
    S = tb.nb_states
    n = nb_substeps
    A = S ** n                                 # branch patterns per step
    P = S ** (n + 1)
    newest_div = S ** (n - 1)                  # pattern -> newest digit
    M = max_nb_states
    if M < P:
        raise ValueError(f"max_nb_states ({M}) must be >= "
                         f"nb_states^(nb_substeps+1) = {P}")
    dtype = positions.dtype
    lengths = lengths.astype(jnp.int32)
    is_bleached = is_bleached.astype(dtype)
    l2 = jnp.broadcast_to(tb.loc_err2.astype(dtype), (B, T, D))
    log_trans = tb.log_trans
    lsurv = tb.log_survive                    # (A,) per new pattern
    lt_tab = ttables.branch_log_trans(log_trans, n).astype(dtype)  # (A, S)
    sig2 = tb.sig2.astype(dtype)
    R = sig2.shape[-2]

    def sig2_at(t):
        row = sig2[..., jnp.minimum(t, R - 1), :] if R > 1 else sig2[..., 0, :]
        return row                             # (P,) or (B, P)

    # ---- initial register: all S^(n+1) two-frame patterns ---------------
    pairs = state_codes(S, n + 1)              # (P, n+1) newest first
    lp0 = ttables.init_log_prob(log_trans, tb.log_frac, n)    # (P,)
    lp = jnp.full((B, M), _NEG, dtype)
    lp = lp.at[:, :P].set(lp0.astype(dtype))
    ll = jnp.zeros((B, M), dtype)
    newest = jnp.broadcast_to(
        jnp.pad(pairs[:, 0], (0, M - P)).astype(jnp.int8), (B, M))
    sig2_pat = jnp.take(sig2_at(0), jnp.asarray(
        np.pad(np.arange(P), (0, M - P))), axis=-1)
    m = jnp.broadcast_to(positions[:, 0, None, :], (B, M, D))
    s2 = jnp.broadcast_to(l2[:, 0, None, :]
                          + jnp.reshape(sig2_pat, (-1, M))[..., None],
                          (B, M, D))
    w_final = jnp.zeros((B, M), dtype)
    end_k = tb.end_ll.astype(dtype)            # (S,)

    def step(carry, xs):
        m, s2, lp, ll, newest, w_final = carry
        t, x_t, l2_t, x_next, l2_next, s2row = xs
        is_final = (t == lengths - 1)
        is_interior = (t < lengths - 1)

        # closing weights for tracks ending here (P = exp(LP+LL+end))
        tot_f = l2_t[:, None, :] + s2
        fin = lp + ll + is_bleached[:, None] * end_k[newest] + jnp.sum(
            -0.5 * jnp.log(2 * jnp.pi * tot_f)
            - (x_t[:, None, :] - m) ** 2 / (2 * tot_f), -1)
        w = jax.nn.softmax(fin, axis=-1)
        w_final = w_final + jnp.where(is_final[:, None], w, 0.0)

        # branch: children (B, A, M) — new sub-state pattern axis first
        tot = l2_t[:, None, :] + s2
        new_m = (m * l2_t[:, None, :] + x_t[:, None, :] * s2) / tot
        tail = l2_t[:, None, :] * s2 / tot
        lc = jnp.sum(-0.5 * jnp.log(2 * jnp.pi * tot)
                     - (x_t[:, None, :] - m) ** 2 / (2 * tot), -1)
        gate = (t + 1 >= min_len).astype(dtype)
        lt = lt_tab.T[newest].swapaxes(1, 2)                   # (B,A,M)
        pat = (jax.lax.broadcasted_iota(jnp.int32, (A, M), 0) * S
               + newest[:, None, :].astype(jnp.int32))          # (B,A,M)
        if s2row.ndim == 1:                                      # (P,)
            sig2_new = s2row[pat]                                # (B,A,M)
        else:                                                    # (B,P)
            sig2_new = jnp.take_along_axis(
                s2row[:, None, :], pat.reshape(B, 1, A * M),
                axis=-1).reshape(B, A, M)
        lp_child = (lp[:, None, :] + lt + lc[:, None, :])
        ll_child = ll[:, None, :] + gate * lsurv.astype(dtype)[
            jax.lax.broadcasted_iota(jnp.int32, (A, M), 0)][None]
        s2_child = sig2_new[..., None] + tail[:, None]          # (B,A,M,D)

        # lookahead pruning score (histograms.py:183-199): LP + next-obs
        # integral; padded slots stay at -inf
        tot_n = l2_next[:, None, None, :] + s2_child
        look = lp_child + jnp.sum(
            -0.5 * jnp.log(2 * jnp.pi * tot_n)
            - (x_next[:, None, None, :] - new_m[:, None]) ** 2 / (2 * tot_n),
            -1)
        # top-M selection as ONE multi-operand sort keyed on the lookahead
        # score: the sort network shuffles every register array along with
        # the keys, replacing top_k + five take_along_axis lane-gathers
        # (dynamic gathers are the slow path on TPU; fixed shuffle
        # patterns are not)
        N = A * M
        scores = look.reshape(B, N)
        orig = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
        m_b = jnp.broadcast_to(new_m[:, None], (B, A, M, D)).reshape(B, N, D)
        s2_f = s2_child.reshape(B, N, D)
        ops = ([-scores] + [m_b[..., d] for d in range(D)]
               + [s2_f[..., d] for d in range(D)]
               + [lp_child.reshape(B, N), ll_child.reshape(B, N), orig])
        sel = [o[:, :M] for o in jax.lax.sort(
            tuple(ops), dimension=1, num_keys=1, is_stable=True)]
        m_new = jnp.stack(sel[1:1 + D], axis=-1)
        s2_new = jnp.stack(sel[1 + D:1 + 2 * D], axis=-1)
        lp_new, ll_new, orig_sel = sel[1 + 2 * D], sel[2 + 2 * D], sel[-1]

        new_state = ((orig_sel // M) // newest_div).astype(jnp.int8)
        keep = is_interior[:, None]
        # backpointer outputs instead of a (B, M, T) sequence carry: the
        # per-step sequence gather was the scan's dominant memory traffic;
        # frozen (non-interior) tracks record identity parents so the
        # final-slot assignment survives to the end of the scan
        parent = jnp.where(keep, orig_sel % M,
                           jax.lax.broadcasted_iota(jnp.int32, (B, M), 1))
        state_out = jnp.where(keep, new_state, newest)
        m = jnp.where(keep[..., None], m_new, m)
        s2 = jnp.where(keep[..., None], s2_new, s2)
        lp = jnp.where(keep, lp_new, lp)
        ll = jnp.where(keep, ll_new, ll)
        newest = jnp.where(keep, new_state, newest)
        return (m, s2, lp, ll, newest, w_final), (parent, state_out)

    ts = jnp.arange(1, T, dtype=jnp.int32)
    pos_t = jnp.swapaxes(positions[:, 1:], 0, 1)
    l2_t = jnp.swapaxes(l2[:, 1:], 0, 1)
    pos_next = jnp.concatenate([positions[:, 2:], positions[:, -1:]], axis=1)
    l2_next = jnp.concatenate([l2[:, 2:], l2[:, -1:]], axis=1)
    if R > 1:
        s2rows = jax.vmap(sig2_at)(jnp.minimum(ts, R - 1))
    else:
        row0 = sig2_at(0)
        s2rows = jnp.broadcast_to(row0[None], (T - 1,) + row0.shape)
    xs = (ts, pos_t, l2_t, jnp.swapaxes(pos_next, 0, 1),
          jnp.swapaxes(l2_next, 0, 1), s2rows)

    carry = (m, s2, lp, ll, newest, w_final)
    carry, (parents, states) = jax.lax.scan(jax.checkpoint(step), carry, xs)
    w_final = carry[-1]
    return decode_backpointers(parents, states, w_final, lengths, pairs,
                               S, M)


def decode_backpointers(parents, states, w_final, lengths, pairs, S, M):
    """Backtrack (T-1, B, M) parent/state backpointers into explicit
    sequences and decode their segments.  Shared by the XLA scan and the
    Pallas top-K kernel (ops/pallas_topk.py), whose step outputs have
    identical semantics.

    After reverse step i (scan step t = i+1) the chain maps final slots
    to the register after step t-1; vals[i] is the state at frame i+2 of
    each final slot."""
    Tm1, B, _ = parents.shape
    T = Tm1 + 1
    P = pairs.shape[0]

    def back(chain, ps):
        par_t, st_t = ps
        val = jnp.take_along_axis(st_t, chain, axis=1)
        return jnp.take_along_axis(par_t, chain, axis=1), val

    chain0 = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None], (B, M))
    chain, vals = jax.lax.scan(back, chain0, (parents, states),
                               reverse=True)
    # chain now indexes the INITIAL register: frames 0 and 1 come from the
    # two-frame init patterns; vals[T-2] targets frame T (discarded)
    pairs_pad = jnp.pad(pairs.astype(jnp.int8), ((0, M - P), (0, 0)))
    col0 = pairs_pad[:, -1][chain]
    col1 = pairs_pad[:, 0][chain]
    seqs = jnp.concatenate(
        [col0[..., None], col1[..., None],
         jnp.moveaxis(vals[:T - 2], 0, -1)], axis=-1)
    return decode_segments(seqs, w_final, lengths, S)


# ---------------------------------------------------------------------------
# Window-DP histogram engine (no sorting, no explicit sequences)
# ---------------------------------------------------------------------------

def _segment_tables(codes: np.ndarray, W: int, T: int, S: int,
                    stride: int = 1):
    """Static per-slot segment decorations of the W-frame window.

    For each register slot (its W states known at compile time, oldest ->
    newest order = reversed code digits):
      * seg_int (K, T, S): completed runs fully inside the window, excluding
        the run touching the window's oldest frame (that one joins the
        carried run distribution);
      * seg_all (W+1, K, T, S): all runs among the newest v window digits,
        for every v (tracks shorter than the window never drop frames);
      * ext (K,): length of the run at the window's oldest end.
    """
    K = codes.shape[0]
    Wf = (W - 1) // stride + 1        # frames in the window
    seg_int = np.zeros((K, T, S), np.float64)
    seg_all = np.zeros((Wf + 1, K, T, S), np.float64)
    ext = np.zeros((K,), np.int32)

    def runs(a):
        out, start = [], 0
        for j in range(1, len(a) + 1):
            if j == len(a) or a[j] != a[j - 1]:
                out.append((j - start, int(a[j - 1])))
                start = j
        return out

    for k in range(K):
        # frame states oldest -> newest: every stride-th sub-digit starting
        # from the oldest (frames sit at digit positions W-1, W-1-n, ..., 0)
        seq = codes[k, ::-1][::stride]
        r = runs(seq)
        ext[k] = r[0][0]
        for ln, s in r[1:]:
            seg_int[k, min(ln, T) - 1, s] += 1
        for v in range(2, Wf + 1):
            for ln, s in runs(seq[Wf - v:]):
                seg_all[v, k, min(ln, T) - 1, s] += 1
    return seg_int, seg_all, ext


@functools.partial(jax.jit,
                   static_argnames=("window", "min_len", "nb_substeps"))
def window_segment_histogram(positions, lengths, is_bleached,
                             tb: ModelTables, *, window: int = 7,
                             min_len: int = 3, nb_substeps: int = 1):
    """Posterior-weighted segment-length histogram via the fixed window.

    TPU-first redesign of the reference P_segment_len
    (extrack/histograms.py:26-284): instead of carrying explicit state
    sequences pruned by argsort (a lane-gather-heavy top-k on TPU), the
    register is the likelihood engine's fixed window of K = S**W state
    sequences, augmented with (i) a per-slot distribution over the length
    of the run containing the window's oldest frame and (ii) a per-slot
    expected histogram of segments completed in the dropped history.  Both
    are mixed by the same fusion weights as the Gaussian moments, so the
    approximation error matches the posterior path's; with window >= track
    length the result is the exact full-enumeration histogram.  No
    sorting, no sequence materialization — every step is dense VPU work.

    With nb_substeps = n > 1 the register covers ``window`` hidden
    SUB-steps ((window-1) % n must be 0 so frames align with the window);
    segment lengths are decoded at frame resolution (the stroboscopic
    sub-state of each frame) — the reference's own substep decode reads
    sub-steps as frames, an upstream inconsistency we do not reproduce
    (DEVIATIONS.md 3b).

    Returns (T, S): row l-1 = expected number of length-l segments per
    state, summed over tracks (per-track posterior normalized).
    """
    from extrack_tpu.core.engine import make_register_spec
    from extrack_tpu.core.tables import branch_log_trans, init_log_prob

    B, T, D = positions.shape
    S = tb.nb_states
    W = window
    n = nb_substeps
    if (W - 1) % n:
        raise ValueError(f"window-1 ({W - 1}) must be a multiple of "
                         f"nb_substeps ({n}) so frames align")
    Wf = (W - 1) // n + 1             # frames covered by the window
    spec = make_register_spec(S, W, n)
    K, A, G = spec.K, spec.A, spec.G
    dtype = positions.dtype
    lengths = lengths.astype(jnp.int32)
    isbl = is_bleached.astype(dtype)[None, :]

    l2 = jnp.broadcast_to(tb.loc_err2.astype(dtype), (B, T, D))
    xs_pos = positions.transpose(1, 2, 0)
    xs_l2 = l2.transpose(1, 2, 0)
    lt_ag = branch_log_trans(tb.log_trans, n)[:, spec.prev0_g].astype(dtype)
    lsurv = tb.log_survive.astype(dtype)
    end_k = jnp.take(tb.end_ll, jnp.asarray(spec.prev0_k),
                     axis=-1).astype(dtype)[:, None]
    lp0 = init_log_prob(tb.log_trans, tb.log_frac, n)

    sig2 = tb.sig2.astype(dtype)
    R = sig2.shape[-2]
    ag_pat = np.arange(A)[:, None] * S + spec.prev0_g[None, :]

    def sig2_ag_at(t_idx):
        row = (sig2[..., 0, :] if R == 1
               else jnp.take(sig2, jnp.minimum(t_idx, R - 1), axis=-2))
        agg = jnp.take(row, jnp.asarray(ag_pat.reshape(-1)), axis=-1)
        if agg.ndim == 1:
            return agg.reshape(A, G, 1)
        return agg.T.reshape(A, G, B)

    # --- static segment decorations ----------------------------------------
    # layout note: per-slot histograms are carried flattened as
    # (K, S*T, B) — the trailing (S*T, B) pair is sublane-aligned, while a
    # (..., S, B) trailing pair would pad S=2..4 sublanes to 8 (4x memory)
    seg_int_np, seg_all_np, ext_np = _segment_tables(spec.codes, W, T, S,
                                                     stride=n)
    seg_int = jnp.asarray(
        seg_int_np.transpose(0, 2, 1).reshape(K, S * T), dtype)
    seg_all = jnp.asarray(
        seg_all_np.transpose(0, 1, 3, 2).reshape(Wf + 1, K, S * T), dtype)
    e_old = jnp.asarray(
        (spec.codes[:, W - 1, None] == np.arange(S)).astype(np.float64),
        dtype)                                              # (K, S)
    # boundary-run shift: bin m reads carried bin m - (ext-1)
    m_idx = np.arange(T)[None, :]
    src = m_idx - (ext_np[:, None] - 1)
    shift_idx = jnp.asarray(np.clip(src, 0, T - 1))         # (K, T)
    shift_ok = jnp.asarray((src >= 0).astype(np.float64), dtype)
    rows_k = jnp.arange(K)[:, None]
    # parent p = g*A + o: does the FRAME run extend across the drop?
    # (the next frame is n sub-digits newer than the dropped oldest one)
    ext_ok_np = (spec.codes[:, W - 1 - n] == spec.codes[:, W - 1])
    ext_ok = jnp.asarray(ext_ok_np.astype(np.float64),
                         dtype).reshape(G, A)[:, :, None, None]

    # --- initial register ----------------------------------------------------
    sig2_init = jnp.take(sig2[..., 0, :], jnp.asarray(spec.init_pat),
                         axis=-1)
    sig2_init = (sig2_init[:, None] if sig2_init.ndim == 1 else sig2_init.T)
    m0 = jnp.broadcast_to(xs_pos[0][:, None, :], (D, K, B))
    s2_0 = jnp.broadcast_to(xs_l2[0][:, None, :] + sig2_init[None],
                            (D, K, B))
    lp_init = (jnp.take(lp0, jnp.asarray(spec.init_pat), axis=-1)
               - spec.dummy_digits * np.log(S)).astype(dtype)
    lp_0 = jnp.broadcast_to(lp_init[:, None], (K, B))
    run_0 = jnp.zeros((K, T, B), dtype).at[:, 0].set(1.0)  # run length 1
    histc_0 = jnp.zeros((K, S * T, B), dtype)
    out_0 = jnp.zeros((S * T,), dtype)

    lt_b = lt_ag[:, :, None, None]
    lsurv_b = lsurv[:, None, None, None]

    def step(carry, xs):
        m, s2, lp, run, histc, out = carry
        t, x_t, l2_t, sig2_ag = xs
        is_final = (t == lengths - 1)
        is_interior = (t < lengths - 1)

        tot = l2_t[:, None, :] + s2
        quad = -0.5 * jnp.log(2 * jnp.pi * tot) \
            - (x_t[:, None, :] - m) ** 2 / (2 * tot)
        lc = jnp.sum(quad, axis=0)                          # (K, B)

        # ---- final-track contribution -------------------------------------
        fin = lp + isbl * end_k + lc
        pbar = jax.nn.softmax(fin, axis=0) \
            * is_final[None, :].astype(dtype)               # (K, B)
        v = jnp.minimum(t + 1, Wf)
        carry_mode = (t + 1 > Wf)
        seg_static = jnp.where(carry_mode, seg_int,
                               jnp.take(seg_all, v, axis=0))  # (K, S*T)
        boundary = run[rows_k, shift_idx] * shift_ok[..., None]  # (K, T, B)
        bnd = (boundary[:, None] * e_old[:, :, None, None]
               ).reshape(K, S * T, B)
        total = histc + jnp.where(carry_mode, bnd, 0.0)
        out = out + (jnp.sum(pbar[:, None, :] * total, axis=(0, 2))
                     + seg_static.T @ jnp.sum(pbar, axis=1))

        # ---- branch + fuse (the engine's shared transport step) -----------
        new_m = (m * l2_t[:, None, :] + x_t[:, None, :] * s2) / tot
        tail = l2_t[:, None, :] * s2 / tot
        gate = (t + 1 >= min_len).astype(dtype)
        _, wn, lp_new, m_f, tail_f, s2_new = engine.branch_fuse(
            lp, lc, new_m, tail, sig2_ag, gate, lt_b, lsurv_b, G, A)

        # ---- run / hist transport across the drop --------------------------
        real_drop = (t >= Wf - 1)
        shifted = jnp.concatenate(
            [jnp.zeros_like(run[:, :1]), run[:, :-1]], axis=1)
        runv = run.reshape(G, A, T, B)
        sel = jnp.where(real_drop,
                        jnp.where(ext_ok, shifted.reshape(G, A, T, B),
                                  jnp.zeros_like(runv).at[:, :, 0].set(1.0)),
                        runv)
        # children of group g are slots a*G+g; A is tiny, so the o-mixes are
        # explicit broadcast sums (an einsum lowers to a dot_general whose
        # padded layouts blow HBM up ~10x)
        run_new = sum(wn[:, :, o, None, :] * sel[None, :, o]
                      for o in range(A)).reshape(K, T, B)   # (A,G,T,B)
        completed = jnp.where(
            real_drop,
            (((1.0 - ext_ok) * runv)[:, :, None, :, :]
             * e_old.reshape(G, A, S, 1, 1)).reshape(G, A, S * T, B), 0.0)
        histv = histc.reshape(G, A, S * T, B) + completed
        hist_new = sum(wn[:, :, o, None, :] * histv[None, :, o]
                       for o in range(A)).reshape(K, S * T, B)

        keep = is_interior[None, :]
        m = jnp.where(keep[None], m_f.reshape(D, K, B), m)
        s2 = jnp.where(keep[None], s2_new.reshape(D, K, B), s2)
        lp = jnp.where(keep, lp_new.reshape(K, B), lp)
        run = jnp.where(keep[:, None], run_new, run)
        histc = jnp.where(keep[:, None], hist_new, histc)
        return (m, s2, lp, run, histc, out), None

    ts = jnp.arange(1, T, dtype=jnp.int32)
    xs = (ts, xs_pos[1:], xs_l2[1:],
          jax.vmap(sig2_ag_at)(ts) if R > 1
          else jnp.broadcast_to(sig2_ag_at(0), (T - 1,)
                                + sig2_ag_at(0).shape))
    carry = (m0, s2_0, lp_0, run_0, histc_0, out_0)
    carry, _ = jax.lax.scan(step, carry, xs)
    return carry[5].reshape(S, T).T


def decode_segments(seqs, weights, lengths, nb_states: int):
    """Histogram of same-state run lengths, weighted per sequence.

    seqs: (B, M, T) int states in forward time order; weights: (B, M);
    lengths: (B,) valid frame counts.  Returns (T, S).
    Vectorized equivalent of the reference's per-step run decoding
    (extrack/histograms.py:253-284).
    """
    B, M, T = seqs.shape
    S = nb_states
    t_idx = jnp.arange(T)
    valid = t_idx[None, :] < lengths[:, None]                    # (B, T)
    change = jnp.concatenate(
        [seqs[:, :, 1:] != seqs[:, :, :-1],
         jnp.ones((B, M, 1), bool)], axis=-1)
    is_end = (change | (t_idx[None, None] == (lengths - 1)[:, None, None])) \
        & valid[:, None, :]
    endpos = jnp.where(is_end, t_idx[None, None], -1)
    last_end = jax.lax.cummax(
        jnp.concatenate([jnp.full((B, M, 1), -1), endpos[:, :, :-1]],
                        axis=-1), axis=2)
    seg_len = jnp.where(is_end, t_idx[None, None] - last_end, 0)  # 1..T

    flat_idx = ((seg_len - 1) * S + seqs.astype(jnp.int32)).reshape(-1)
    vals = (jnp.broadcast_to(weights[..., None], seqs.shape)
            * is_end).reshape(-1)
    hist = jnp.zeros((T * S,), weights.dtype).at[
        jnp.clip(flat_idx, 0, T * S - 1)].add(vals)
    return hist.reshape(T, S)


# ---------------------------------------------------------------------------
# Reference-compatible drivers
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("nb_states", "cell_dims", "window", "min_len",
                     "matrix_type", "mesh", "compute_engine",
                     "nb_substeps"))
def _hist_sharded_from_values(values, positions, lengths, is_bleached,
                              loc_err_in, dt_arr, *, nb_states, cell_dims,
                              window, min_len, matrix_type, mesh,
                              compute_engine, nb_substeps=1):
    """Table build + shard_map histogram in one jit (mesh is static)."""
    from extrack_tpu.parallel import mesh as pmesh
    Ds, Fs, rates, loc_err, pBL = tparams.extract_arrays(
        values, nb_states, input_loc_err=loc_err_in)
    tb = ttables.build_tables(Ds, loc_err, Fs, rates, pBL, dt_arr,
                              cell_dims=cell_dims, matrix_type=matrix_type,
                              nb_substeps=nb_substeps)
    b = tdata.TrackBatch(positions, lengths, None, is_bleached)
    return pmesh.sharded_histogram(b, tb, window=window, min_len=min_len,
                                   mesh=mesh, nb_substeps=nb_substeps,
                                   compute_engine=compute_engine)


@functools.partial(
    jax.jit, static_argnames=("nb_states", "cell_dims", "matrix_type",
                              "engine", "window", "max_nb_states",
                              "min_len", "nb_substeps"))
def _hist_from_values(values, positions, lengths, is_bleached, loc_err_in,
                      dt_arr, *, nb_states, cell_dims, matrix_type, engine,
                      window, max_nb_states, min_len, nb_substeps=1):
    """Parameter extraction + table build + histogram scan in one jit
    (eager table ops cost seconds each through the TPU tunnel)."""
    Ds, Fs, rates, loc_err, pBL = tparams.extract_arrays(
        values, nb_states, input_loc_err=loc_err_in)
    tb = ttables.build_tables(Ds, loc_err, Fs, rates, pBL, dt_arr,
                              cell_dims=cell_dims, matrix_type=matrix_type,
                              nb_substeps=nb_substeps)
    if engine == "pallas":
        from extrack_tpu.ops import pallas_hist
        return pallas_hist.hist_pallas(
            positions, lengths, is_bleached, tb, window=window,
            min_len=min_len,
            interpret=jax.default_backend() != "tpu")
    if engine == "window":
        return window_segment_histogram(positions, lengths, is_bleached,
                                        tb, window=window, min_len=min_len,
                                        nb_substeps=nb_substeps)
    if engine == "topk_pallas":
        from extrack_tpu.ops import pallas_topk
        return pallas_topk.segment_topk_pallas(
            positions, lengths, is_bleached, tb,
            max_nb_states=max_nb_states, min_len=min_len,
            nb_substeps=nb_substeps,
            interpret=jax.default_backend() != "tpu")
    return segment_histogram(positions, lengths, is_bleached, tb,
                             max_nb_states=max_nb_states, min_len=min_len,
                             nb_substeps=nb_substeps)


def len_hist(all_tracks: Dict[str, np.ndarray],
             params,
             dt,
             cell_dims=(0.5, None, None),
             nb_states: int = 2,
             max_nb_states: int = 500,
             workers: int = 1,
             nb_substeps: int = 1,
             input_LocErr=None,
             matrix_type: int = 1,
             engine: str = "window",
             window: int = 7,
             chunk: Optional[int] = None,
             sharded: bool = False) -> np.ndarray:
    """Reference-compatible driver (extrack/histograms.py:294-373).

    Returns (max_track_len, S).  ``workers`` accepted for compatibility.
    ``window`` counts FRAMES; with nb_substeps = n > 1 the register covers
    n*(window-1)+1 hidden sub-steps (reference P_segment_len supports
    substeps in its recursion, extrack/histograms.py:26,64-145; segment
    decoding here stays at frame resolution, DEVIATIONS.md 3b).

    engine='window' (default) uses the sort-free fixed-window DP
    (window_segment_histogram) — on TPU it auto-upgrades to the
    VMEM-resident Pallas kernel when eligible (nb_substeps=1; per-peak
    LocErr and variable dt included); engine='topk' keeps the explicit
    top-``max_nb_states``-sequences register matching the reference's
    pruning rule (nb_substeps=1 only); engine='pallas'/'xla' force a path.

    ``sharded=True`` shards the tracks over a 1-D data mesh of all
    available devices; per-shard histograms psum over ICI
    (parallel.mesh.sharded_histogram; the reference reduces per-chunk
    histograms from its pool the same way, extrack/histograms.py:360-367).
    """
    del workers
    batch = tdata.from_dict(all_tracks, input_loc_err=input_LocErr,
                            dt=dt if isinstance(dt, dict) else None)
    return hist_batch(batch, params, dt if not isinstance(dt, dict) else 0.0,
                      cell_dims=cell_dims, nb_states=nb_states,
                      max_nb_states=max_nb_states, nb_substeps=nb_substeps,
                      input_loc_err=input_LocErr is not None,
                      matrix_type=matrix_type, engine=engine, window=window,
                      chunk=chunk, sharded=sharded)


def hist_batch(batch: tdata.TrackBatch,
               params,
               dt,
               cell_dims=(0.5, None, None),
               nb_states: int = 2,
               max_nb_states: int = 500,
               nb_substeps: int = 1,
               input_loc_err: bool = False,
               matrix_type: int = 1,
               engine: str = "window",
               window: int = 7,
               chunk: Optional[int] = None,
               min_len: Optional[int] = None,
               sharded: bool = False) -> np.ndarray:
    """TrackBatch-native duration histogram: the device-resident core of
    ``len_hist``, for pipelines that keep data as padded batches and touch
    the reference's length-keyed dicts only at the edges."""
    if nb_substeps != 1 and engine == "pallas":
        raise NotImplementedError(
            "nb_substeps > 1 requires engine='window' or 'topk'")
    force_xla = engine == "xla"
    if force_xla:
        engine = "window"
    window_sub = nb_substeps * (window - 1) + 1
    if (engine == "window" and not force_xla
            and jax.default_backend() == "tpu" and nb_substeps == 1):
        from extrack_tpu.ops import pallas_hist
        if pallas_hist.hist_block_cap(batch.max_len, batch.nb_dims,
                                      nb_states ** window_sub,
                                      nb_states) >= 128:
            engine = "pallas"
        else:
            import warnings
            warnings.warn(
                "len_hist: register for this window/track length exceeds "
                "the kernel's VMEM budget; falling back to the XLA scan "
                "(slower).", RuntimeWarning, stacklevel=2)
    if chunk is None:
        # bound the scan carry (~K*S*T floats/track plus ~4x intermediates);
        # the VMEM-resident kernel streams per grid block and needs no
        # small chunks
        K = nb_states ** window_sub
        per_track = K * nb_states * batch.max_len * 4 * 4
        chunk = (1 << 20 if engine == "pallas"
                 else int(min(65536, max(4096, (1 << 31) // per_track))))
    values = (params.resolve()
              if isinstance(params, tparams.Parameters) else params)
    cell = tuple(c for c in cell_dims if c is not None)
    if min_len is None:
        # before any padding: padded batches may lack the host length cache
        lens = tdata.host_lengths(batch)
        min_len = tdata.default_min_len(lens)
    if sharded and engine not in ("window", "pallas"):
        import warnings
        warnings.warn(
            f"len_hist: sharded=True is not supported for engine="
            f"{engine!r}; running on a single device.", RuntimeWarning,
            stacklevel=2)
    if batch.batch_size > chunk:
        batch = batch.pad_batch_to(
            int(np.ceil(batch.batch_size / chunk)) * chunk)
    if sharded and engine in ("window", "pallas"):
        from extrack_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh()
        # the chunk bound is per device: each shard runs the same scan
        gchunk = chunk * mesh.devices.size
        hist = None
        for c in range(int(np.ceil(batch.batch_size / gchunk))):
            sl = slice(c * gchunk, (c + 1) * gchunk)
            part = tdata.TrackBatch(
                batch.positions[sl], batch.lengths[sl],
                batch.loc_err[sl] if batch.loc_err is not None else None,
                batch.is_bleached[sl],
                None if batch.frames is None else batch.frames[sl],
                None if batch.dt is None else batch.dt[sl])
            part = pmesh.shard_batch(part, mesh)
            dt_arr = part.dt if part.dt is not None else jnp.asarray(dt)
            h = _hist_sharded_from_values(
                values, part.positions, part.lengths, part.is_bleached,
                part.loc_err if input_loc_err else None, dt_arr,
                nb_states=nb_states, cell_dims=cell, window=window_sub,
                min_len=min_len, matrix_type=matrix_type, mesh=mesh,
                nb_substeps=nb_substeps,
                compute_engine="pallas" if engine == "pallas" else "xla")
            hist = h if hist is None else hist + h
        return np.asarray(hist)
    dt_arr = batch.dt if batch.dt is not None else jnp.asarray(dt)
    # round the top-k register up to a lane-friendly multiple of 128
    M = max(int(np.ceil(max_nb_states / 128)) * 128, 128)
    if engine == "topk_pallas":
        # OPT-IN experiment, not an auto-upgrade: the in-VMEM bitonic
        # top-M kernel (ops/pallas_topk.py) measured 6.2k tracks/s vs
        # the XLA scan's 18.2k at M=512/T=10 on TPU v5e — sublane
        # compare-exchange shuffles run at ~6% of the VPU issue rate, so
        # fine-grained sorting loses to XLA's fused sort even with the
        # register VMEM-resident (see DEVIATIONS.md 3c and
        # docs/performance.md; the TPU-native answer to pruning remains
        # the window-DP engine).
        from extrack_tpu.ops import pallas_topk
        if not (batch.dt is None and np.ndim(dt) == 0
                and pallas_topk.supports(batch.max_len, batch.nb_dims,
                                         nb_states, M, nb_substeps)):
            raise NotImplementedError(
                "engine='topk_pallas' needs constant dt and a register "
                "inside the VMEM budget")
        # the backpointer outputs dominate memory: (T-1)*M*B*8 bytes
        chunk = min(chunk, 32768)
        if batch.batch_size > chunk:
            batch = batch.pad_batch_to(
                int(np.ceil(batch.batch_size / chunk)) * chunk)
    kw = dict(nb_states=nb_states, cell_dims=cell, matrix_type=matrix_type,
              engine=engine, window=window_sub, max_nb_states=M,
              min_len=min_len, nb_substeps=nb_substeps)
    hist = None
    for c in range(int(np.ceil(batch.batch_size / chunk))):
        sl = slice(c * chunk, (c + 1) * chunk)
        h = _hist_from_values(
            values, batch.positions[sl], batch.lengths[sl],
            batch.is_bleached[sl],
            batch.loc_err[sl] if input_loc_err else None,
            dt_arr[sl] if dt_arr.ndim > 1 else dt_arr, **kw)
        hist = h if hist is None else hist + h
    return np.asarray(hist)


def ground_truth_hist(all_Bs: Dict[str, np.ndarray],
                      nb_states: int = 2,
                      long_tracks: bool = False,
                      nb_steps_lim: int = 20) -> np.ndarray:
    """Segment histogram of simulated ground-truth state labels.

    Reference: extrack/histograms.py:403-457.  Uses the same vectorized
    decoder with unit weights.
    """
    keys = [k for k in all_Bs if len(all_Bs[k]) > 0
            and (not long_tracks or int(k) >= nb_steps_lim)]
    if not keys:
        return np.zeros((0, nb_states))
    tmax = max(int(k) for k in keys)
    hist = np.zeros((tmax, nb_states))
    for k in keys:
        arr = np.asarray(all_Bs[k])
        b, t = arr.shape
        h = decode_segments(jnp.asarray(arr[:, None, :], jnp.int8),
                            jnp.ones((b, 1)),
                            jnp.full((b,), t, jnp.int32), nb_states)
        hist[:t] += np.asarray(h)
    return hist
