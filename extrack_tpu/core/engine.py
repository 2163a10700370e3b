"""Fixed-width sequence-register likelihood engine.

The reference computes per-track likelihoods with a per-frame recursion whose
working set of candidate state sequences *grows* (``cp.repeat``) and is then
*pruned* by Python-loop greedy fusion (extrack/tracking.py:427-743).  Dynamic
shapes and host loops are exactly wrong for XLA, so this engine uses the
mathematically-equivalent fixed-point of that process:

    a register of K = S**W state windows (W = ``frame_len`` in the reference),
    updated by one fused branch(xS^n) -> Gaussian-update -> moment-match(/S^n)
    step per frame inside a ``lax.scan``.

This is identical to the reference's fixed-``frame_len`` path
(``P_Cs_inter_bound_stats`` + ``fuse_tracks_general`` with the oldest states
fused, extrack/tracking.py:109-318,361-423): sequences equal on the last W
sub-steps are merged into a weighted single Gaussian.  Early steps, where the
reference register is still small, are reproduced exactly by initializing the
K slots as duplicated copies carrying a ``-r*log(S)`` offset so that each
no-op fusion of a dummy axis restores the exact log-probability.  The
reference skips the fusion at its last loop step (tracking.py:255,
"do not fuse sequences at the last step"), so its final integral runs on
the *pre-fusion* width-(W+1) register; the scan reproduces this by closing
each track one step early, on the pre-fusion children of step L-2
(``logL parity vs the transcribed reference loop <= 1e-12``,
tests/test_reference_parity.py).  A side effect: the engine is exact for
tracks up to W+1 frames, not just W.

Tracks of different lengths run in one padded batch: each track's final frame
triggers its closing integral + bleaching term, after which its carry is
frozen.  The scan is ``vmap``-free (explicitly batched) so XLA lays out the
(B, K) register on VPU lanes; batches shard over a data mesh via
``shard_map`` (see extrack_tpu.parallel).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from extrack_tpu.core.tables import (ModelTables, branch_log_trans,
                                     init_log_prob, state_codes)

def _tiny(dtype):
    """Division/log guard that does not underflow in the WORKING dtype:
    the literal 1e-300 is 0.0 in float32 (the production TPU dtype), which
    turned an all-(-inf) fusion group (e.g. a forbidden transition's
    log_trans) into wn = 0/0 = NaN poisoning the whole register."""
    return jnp.finfo(dtype).tiny


class RegisterSpec(NamedTuple):
    """Static index constants of the sequence register."""
    S: int          # states
    W: int          # window width in sub-steps (frame_len)
    n: int          # sub-steps per frame
    K: int          # S**W register slots
    A: int          # S**n branch patterns
    G: int          # K // A surviving group count
    codes: np.ndarray       # (K, W) digits, newest first
    prev0_g: np.ndarray     # (G,) newest state of parent group g
    prev0_k: np.ndarray     # (K,) newest state of slot k
    init_pat: np.ndarray    # (K,) index of top n+1 digits (init pattern)
    dummy_digits: int       # W - n - 1


def make_register_spec(nb_states: int, window: int, nb_substeps: int = 1
                       ) -> RegisterSpec:
    S, W, n = nb_states, window, nb_substeps
    if W < n + 1:
        raise ValueError(f"window ({W}) must be >= nb_substeps+1 ({n + 1})")
    K = S ** W
    A = S ** n
    G = K // A
    codes = state_codes(S, W)
    prev0_k = codes[:, 0]
    prev0_g = np.arange(G) // (S ** (W - n - 1))
    init_pat = np.arange(K) // (S ** (W - n - 1))
    return RegisterSpec(S, W, n, K, A, G, codes, prev0_g, prev0_k,
                        init_pat, W - n - 1)


def _gather_rows(table, idx):
    """Gather along the last axis with a numpy index array, keeping leading
    batch axes: table (..., P), idx (I,) -> (..., I) or (I,) when unbatched."""
    return jnp.take(table, jnp.asarray(idx), axis=-1)


def branch_fuse(lp, lc, new_m, tail, sig2_ag, gate, lt_b, lsurv_b, G, A):
    """Branch into the S^n children and fuse the oldest digit by weighted
    moment match — the register-transport step shared by the likelihood
    scan below and histograms.window_segment_histogram (one definition:
    this math is correctness-critical and oracle-anchored at 1e-10).

    lp/lc: (K, B); new_m/tail: (D, K, B) posterior means/variance tails;
    sig2_ag: (A, G, 1|B) child displacement variances; lt_b (A, G, 1, 1)
    and lsurv_b (A, 1, 1, 1) broadcast tables.  Returns (lp_child
    (A,G,O,B), wn (A,G,O,B), lp_new (A,G,B), m_f/tail_f/s2_new (D,A,G,B)).
    """
    D = new_m.shape[0]
    B = lp.shape[-1]
    base = (lp + lc).reshape(G, A, B)                     # o = axis 1
    lp_child = base[None] + lt_b + gate * lsurv_b         # (A,G,O,B)
    mx = jnp.max(lp_child, axis=2, keepdims=True)
    safe = jnp.where(jnp.isfinite(mx), mx, 0.0)
    w = jnp.exp(lp_child - safe)
    sw = jnp.sum(w, axis=2)
    tiny = _tiny(sw.dtype)
    wn = w / jnp.maximum(sw[:, :, None], tiny)            # (A,G,O,B)
    lp_new = (jnp.squeeze(safe, 2) + jnp.log(jnp.maximum(sw, tiny))
              + jnp.where(jnp.isfinite(mx[:, :, 0]), 0.0, -jnp.inf))
    new_mv = new_m.reshape(D, G, A, B)
    tailv = tail.reshape(D, G, A, B)
    m_f = sum(wn[None, :, :, o] * new_mv[:, None, :, o]
              for o in range(A))                          # (D,A,G,B)
    tail_f = sum(wn[None, :, :, o] * tailv[:, None, :, o]
                 for o in range(A))
    s2_new = sig2_ag[None] + tail_f
    return lp_child, wn, lp_new, m_f, tail_f, s2_new


def _moment_match(lp, values):
    """Fuse the trailing axis of ``lp`` (log weights) by logsumexp while
    moment-matching each array in ``values`` (weighted mean).

    Reference: fuse_tracks_general, extrack/tracking.py:361-423.
    """
    mx = jnp.max(lp, axis=-1, keepdims=True)
    safe_mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    w = jnp.exp(lp - safe_mx)
    sw = jnp.sum(w, axis=-1, keepdims=True)
    tiny = _tiny(sw.dtype)
    wn = w / jnp.maximum(sw, tiny)
    lp_new = jnp.squeeze(safe_mx, -1) + jnp.log(jnp.maximum(sw[..., 0], tiny)) \
        + jnp.where(jnp.isfinite(mx[..., 0]), 0.0, -jnp.inf)
    fused = [jnp.einsum('...o,...od->...d', wn, v) for v in values]
    return lp_new, fused, wn


@functools.partial(
    jax.jit,
    static_argnames=("window", "nb_substeps", "min_len", "return_preds",
                     "remat"))
def forward(positions,
            lengths,
            is_bleached,
            tables: ModelTables,
            *,
            window: int = 6,
            nb_substeps: int = 1,
            min_len: int = 3,
            return_preds: bool = False,
            remat: bool = True):
    """Per-track log likelihood (and optional per-frame state posteriors).

    positions: (B, T, D) padded tracks; lengths: (B,) valid frame counts
    (padded/empty tracks use length 0 and contribute exactly 0); is_bleached:
    (B,) 1.0 where the track ended inside the observation window.

    Returns ``logl (B,)`` or ``(logl, preds (B, T, S))`` with
    ``return_preds=True`` (posteriors carried through fusions like the
    reference's ``cur_Bs_cat``, extrack/tracking.py:479,543-544,645-649;
    requires nb_substeps == 1 as in predict_Bs, extrack/tracking.py:839).
    TPU layout note: all working arrays keep the (large) track axis LAST so
    it lands on the 128-wide vector lanes, with the K-register on sublanes —
    the natural (B, K, D) layout puts D=2..3 on lanes and wastes 40-60x of
    the VPU.  Inputs/outputs stay batch-major; transposes happen once.
    """
    B, T, D = positions.shape
    spec = make_register_spec(tables.nb_states, window, nb_substeps)
    S, W, n, K, A, G = spec.S, spec.W, spec.n, spec.K, spec.A, spec.G
    if return_preds and n != 1:
        raise ValueError("posteriors require nb_substeps == 1")

    dtype = positions.dtype
    lengths = lengths.astype(jnp.int32)
    isbl = is_bleached.astype(dtype)[None, :]                         # (1,B)

    l2 = jnp.broadcast_to(tables.loc_err2.astype(dtype), (B, T, D))
    xs_pos = positions.transpose(1, 2, 0)                             # (T,D,B)
    xs_l2 = l2.transpose(1, 2, 0)                                     # (T,D,B)
    lt_ag = branch_log_trans(tables.log_trans, n)[:, spec.prev0_g]    # (A,G)
    lsurv = tables.log_survive.astype(dtype)                          # (A,)
    end_k = _gather_rows(tables.end_ll, spec.prev0_k).astype(
        dtype)[:, None]                                               # (K,1)
    end_a = _gather_rows(tables.end_ll, state_codes(S, n)[:, 0]
                         ).astype(dtype)                              # (A,)
    lp0 = init_log_prob(tables.log_trans, tables.log_frac, n)         # (P,)

    # displacement variance tables, as (A, G, 1|B) per step
    sig2 = tables.sig2.astype(dtype)
    R = sig2.shape[-2]
    ag_pat = np.arange(A)[:, None] * S + spec.prev0_g[None, :]        # (A,G)

    def sig2_ag_at(t_idx):
        row = (sig2[..., 0, :] if R == 1
               else jnp.take(sig2, jnp.minimum(t_idx, R - 1), axis=-2))
        agg = _gather_rows(row, ag_pat.reshape(-1))       # (A*G,) or (B,A*G)
        if agg.ndim == 1:
            return agg.reshape(A, G, 1)
        return agg.T.reshape(A, G, B)

    # ---- initial register (frame 0 injected) -----------------------------
    sig2_init = _gather_rows(
        sig2[..., 0, :], spec.init_pat)                   # (K,) or (B,K)
    sig2_init = (sig2_init[:, None] if sig2_init.ndim == 1
                 else sig2_init.T)                        # (K, 1|B)
    m0 = jnp.broadcast_to(xs_pos[0][:, None, :], (D, K, B))
    s2_0 = jnp.broadcast_to(xs_l2[0][:, None, :] + sig2_init[None],
                            (D, K, B))
    lp_init = (_gather_rows(lp0, spec.init_pat)
               - spec.dummy_digits * np.log(S)).astype(dtype)
    lp_0 = jnp.broadcast_to(lp_init[:, None], (K, B))
    logl_0 = jnp.zeros((B,), dtype)

    Tpad = T + W
    if return_preds:
        cat_0 = jnp.zeros((K, Tpad, S, B), dtype)
        preds_0 = jnp.zeros((T, S, B), dtype)
        onehot = jnp.asarray(
            (spec.codes[:, ::-1, None] == np.arange(S)).astype(dtype))
    else:
        cat_0 = preds_0 = onehot = None

    lt_b = lt_ag[:, :, None, None].astype(dtype)          # (A,G,1,1)
    lsurv_b = lsurv[:, None, None, None]                  # (A,1,1,1)

    def step(carry, xs):
        m, s2, lp, logl, cat, preds = carry
        t, x_t, l2_t, x_n, l2_n, sig2_ag = xs             # x/l2 (D,B)
        is_final = (t == lengths - 1)                     # (B,)
        is_interior = (t < lengths - 1)

        # -- closing contribution for tracks ending at this frame ----------
        # (2-frame tracks only; longer tracks close one step early on the
        # pre-fusion children below, matching the reference's skipped
        # last-step fusion, tracking.py:255)
        tot = l2_t[:, None, :] + s2                       # (D,K,B)
        quad = -0.5 * jnp.log(2 * jnp.pi * tot) \
            - (x_t[:, None, :] - m) ** 2 / (2 * tot)
        lc = jnp.sum(quad, axis=0)                        # (K,B)
        fin = lp + isbl * end_k + lc
        logl = logl + jnp.where(is_final & (lengths == 2),
                                logsumexp(fin, axis=0), 0.0)

        # -- branch + Gaussian update (a-independent parts once per parent) -
        new_m = (m * l2_t[:, None, :] + x_t[:, None, :] * s2) / tot
        tail = l2_t[:, None, :] * s2 / tot                # (D,K,B)

        gate = (t + 1 >= min_len).astype(dtype)
        # branch + fuse via the shared transport step
        lp_child, wn, lp_new, m_f, tail_f, s2_new = branch_fuse(
            lp, lc, new_m, tail, sig2_ag, gate, lt_b, lsurv_b, G, A)

        # -- look-ahead closing on the PRE-fusion children ------------------
        # tracks ending at frame t+1 integrate it against the width-(W+n)
        # child register before any fusion (the reference's final state)
        new_mv4 = new_m.reshape(D, G, A, B)
        tailv4 = tail.reshape(D, G, A, B)
        totn = (sig2_ag[None, :, :, None] + tailv4[:, None]
                + l2_n[:, None, None, None, :])           # (D,A,G,O,B)
        lcn = jnp.sum(-0.5 * jnp.log(2 * jnp.pi * totn)
                      - (x_n[:, None, None, None, :]
                         - new_mv4[:, None]) ** 2 / (2 * totn), axis=0)
        fin_n = lp_child + isbl * end_a[:, None, None, None] + lcn
        logl = logl + jnp.where(t == lengths - 2,
                                logsumexp(fin_n, axis=(0, 1, 2)), 0.0)

        keep = is_interior[None, :]
        m = jnp.where(keep[None], m_f.reshape(D, K, B), m)
        s2 = jnp.where(keep[None], s2_new.reshape(D, K, B), s2)
        lp = jnp.where(keep, lp_new.reshape(K, B), lp)

        if return_preds:
            # mix posterior histories with the fusion weights, then record
            # the state distribution of the frame dropped from the window
            z = jnp.zeros((), t.dtype)
            catv = cat.reshape(G, A, Tpad, S, B)
            mixed = sum(wn[:, :, o, None, None, :] * catv[None, :, o]
                        for o in range(A))                # (A,G,Tpad,S,B)
            mixed = mixed.reshape(K, Tpad, S, B)
            mixed = jax.lax.dynamic_update_slice(
                mixed, wn.reshape(K, 1, S, B), (z, t + 1, z, z))
            cat = jnp.where(keep[None, None], mixed, cat)

            pbar = jax.nn.softmax(fin, axis=0)            # (K,B)
            hist = jnp.einsum('kb,ktsb->tsb', pbar, cat)
            wpost = jnp.einsum('kb,kws->wsb', pbar, onehot)
            hist = jax.lax.dynamic_update_slice(hist, wpost, (t + 1, z, z))
            preds = preds + jnp.where(is_final[None, None],
                                      hist[W:], 0.0)

        return (m, s2, lp, logl, cat, preds), None

    if remat:
        step = jax.checkpoint(step)

    ts = jnp.arange(1, T, dtype=jnp.int32)
    # next-frame inputs for the look-ahead closing (last row never read:
    # t = lengths-2 <= T-2 for any track)
    xs_pos_n = jnp.concatenate([xs_pos[2:], xs_pos[-1:]], axis=0)
    xs_l2_n = jnp.concatenate([xs_l2[2:], xs_l2[-1:]], axis=0)
    xs = (ts, xs_pos[1:], xs_l2[1:], xs_pos_n, xs_l2_n,
          jax.vmap(sig2_ag_at)(ts) if R > 1
          else jnp.broadcast_to(sig2_ag_at(0), (T - 1,)
                                + sig2_ag_at(0).shape))

    carry = (m0, s2_0, lp_0, logl_0, cat_0, preds_0)
    carry, _ = jax.lax.scan(step, carry, xs)
    logl = carry[3]
    if return_preds:
        return logl, carry[5].transpose(2, 0, 1)
    return logl


def batch_log_likelihood(batch, tables, **kw):
    """Sum of per-track log likelihoods for a TrackBatch."""
    return jnp.sum(forward(batch.positions, batch.lengths, batch.is_bleached,
                           tables, **kw))
