"""Position refinement: most-likely true positions + refined uncertainty.

Equivalent of the reference refined_localization module
(extrack/refined_localization.py:48-338): for every localization, the
posterior over the particle's *true* position is a Gaussian mixture formed by
combining, per hidden state, a prior propagated from all earlier positions, a
prior propagated from all later positions, and the observation itself
(prod_3GaussPDF, :229-285); track ends use two-term products (:221,291).

TPU redesign: the reference runs its recursion twice with Python-loop fusion
and then aligns forward/backward sequence sets per state with host loops.
Here both directions are the same fixed-register scan as the likelihood
engine (suffix direction = prefix scan on per-track-reversed data, so mixed
track lengths stay one padded batch), each emitting its running register
(m, s2, logP) per step.  Register slots are ordered with the newest state in
the leading digit, so the per-state forward/backward alignment is a free
reshape to (S, K/S) blocks — no matching loops.

Matching the reference's weighting scheme: refinement log-weights carry
transition terms only — no occupation fractions, survival, or bleaching terms
(get_LC_Km_Ks accumulates LT+LC only and the backward pass uses uniform
fractions, refined_localization.py:93-96,218).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from extrack_tpu import data as tdata
from extrack_tpu.core import gaussian as gaussian_ops
from extrack_tpu.core.engine import make_register_spec, _moment_match
from extrack_tpu.core.tables import branch_log_trans, state_codes

# NOTE: must not underflow in float32 (the production TPU dtype) — see
# core.engine._tiny; used only as a division guard on nonnegative sums
_TINY = 1e-30


def _refine_scan(positions, l2, lengths, log_trans, sig2_states, W):
    """Prefix scan emitting, for every step t in 1..T-1, the register
    (m, s2, lp) describing r_t given x_{<t} (before x_t is injected).

    sig2_states: (S,) displacement variance per state (2*D*dt); pair variance
    is the mean of the two adjacent states' values as in the engine.
    Returns (ms (B,T,K,D), s2s (B,T,K,D), lps (B,T,K)) with slot 0 dummy.
    """
    B, T, D = positions.shape
    S = log_trans.shape[0]
    spec = make_register_spec(S, W, 1)
    K, G, A = spec.K, spec.G, spec.A
    dtype = positions.dtype

    lt_ag = branch_log_trans(log_trans, 1)[:, spec.prev0_g]      # (S, G)
    sig2_pair = 0.5 * (sig2_states[:, None] + sig2_states[None, :])  # (a, s)
    sig2_ag = sig2_pair[:, spec.prev0_g]                          # (S, G)

    init_pat = spec.init_pat                                      # (K,)
    pairs = state_codes(S, 2)
    lp0 = log_trans[pairs[:, 1], pairs[:, 0]]                     # LT only
    lp_init = (lp0[init_pat] - spec.dummy_digits * np.log(S)).astype(dtype)
    sig2_init = sig2_pair.reshape(-1)[init_pat]

    m0 = jnp.broadcast_to(positions[:, 0, None, :], (B, K, D))
    s2_0 = jnp.broadcast_to(l2[:, 0, None, :] + sig2_init[None, :, None],
                            (B, K, D))
    lp_0 = jnp.broadcast_to(lp_init, (B, K))

    def step(carry, xs):
        m, s2, lp = carry
        t, x_t, l2_t = xs
        emit = (m, s2, lp)
        is_interior = (t < lengths - 1)
        tot = l2_t[:, None, :] + s2
        new_m = (m * l2_t[:, None, :] + x_t[:, None, :] * s2) / tot
        tail = l2_t[:, None, :] * s2 / tot
        lc = jnp.sum(-0.5 * jnp.log(2 * jnp.pi * tot)
                     - (x_t[:, None, :] - m) ** 2 / (2 * tot), -1)
        base = (lp + lc).reshape(B, G, A)
        lp_child = base[:, None] + lt_ag[None, :, :, None]
        lp_new, (m_f, tail_f), _ = _moment_match(
            lp_child,
            [new_m.reshape(B, 1, G, A, D), tail.reshape(B, 1, G, A, D)])
        s2_new = sig2_ag[None, :, :, None] + tail_f
        keep = is_interior[:, None]
        m = jnp.where(keep[..., None], m_f.reshape(B, K, D), m)
        s2 = jnp.where(keep[..., None], s2_new.reshape(B, K, D), s2)
        lp = jnp.where(keep, lp_new.reshape(B, K), lp)
        return (m, s2, lp), emit

    ts = jnp.arange(1, T, dtype=jnp.int32)
    xs = (ts, jnp.swapaxes(positions[:, 1:], 0, 1),
          jnp.swapaxes(l2[:, 1:], 0, 1))
    _, (ms, s2s, lps) = jax.lax.scan(step, (m0, s2_0, lp_0), xs)

    pad = lambda a: jnp.concatenate(  # noqa: E731 — slot k=0 is a dummy
        [jnp.zeros_like(a[:1]), a], axis=0)
    return (jnp.swapaxes(pad(ms), 0, 1), jnp.swapaxes(pad(s2s), 0, 1),
            jnp.swapaxes(pad(lps), 0, 1))


def _reverse_tracks(arr, lengths):
    """Per-track time reversal of a padded (B, T, ...) array."""
    B, T = arr.shape[:2]
    idx = jnp.clip(lengths[:, None] - 1 - jnp.arange(T)[None, :], 0, T - 1)
    return jnp.take_along_axis(
        arr, idx.reshape((B, T) + (1,) * (arr.ndim - 2)), axis=1)


@functools.partial(jax.jit, static_argnames=("window",))
def position_mixtures(positions, lengths, loc_err2, log_trans, sig2_states,
                      *, window: int = 7):
    """The full per-position true-position Gaussian mixture.

    Equivalent of the reference get_pos_PDF (refined_localization.py:207-302):
    at every localization, a mixture over state-matched (prefix-slot,
    suffix-slot) pairs; track ends mix over single-side slots.

    Returns ``(mu (B,T,C,D), var (B,T,C,D), lw (B,T,C), labels (C,))`` with
    C = S*(K/S)^2 components, s-major; unused components carry -inf weight
    (ends populate components c = s*KS^2 + i*KS).  ``labels[c]`` is the
    hidden state of the position under component c.
    """
    B, T, D = positions.shape
    S = log_trans.shape[0]
    spec = make_register_spec(S, window, 1)
    K = spec.K
    KS = K // S
    dtype = positions.dtype
    lengths = lengths.astype(jnp.int32)
    l2 = jnp.broadcast_to(loc_err2.astype(dtype), (B, T, D))

    # prefix: priors from earlier positions (transitions in forward time)
    pm, ps2, plp = _refine_scan(positions, l2, lengths, log_trans,
                                sig2_states, window)
    # suffix: priors from later positions — prefix scan on reversed tracks
    # with the transposed transition matrix (refined_localization.py:216-218)
    rpos = _reverse_tracks(positions, lengths)
    rl2 = _reverse_tracks(l2, lengths)
    sm, ss2, slp = _refine_scan(rpos, rl2, lengths, log_trans.T,
                                sig2_states, window)
    # map suffix emissions back to forward positions: k -> len-1-k
    sm = _reverse_tracks(sm, lengths)
    ss2 = _reverse_tracks(ss2, lengths)
    slp = _reverse_tracks(slp, lengths)

    x = positions[:, :, None, :]
    # ---- end products: obs x prior from the single available side --------
    def prod2(m, s2, lp):
        tot = s2 + l2[:, :, None, :]
        mu = (x * s2 + m * l2[:, :, None, :]) / tot
        var = s2 * l2[:, :, None, :] / tot
        lw = lp + jnp.sum(-0.5 * jnp.log(2 * jnp.pi * tot)
                          - (x - m) ** 2 / (2 * tot), -1)
        return mu, var, lw                          # (B,T,K,D) x2, (B,T,K)

    mu_s, var_s, lw_s = prod2(sm, ss2, slp)         # for k = 0
    mu_p, var_p, lw_p = prod2(pm, ps2, plp)         # for k = L-1

    # ---- interior: state-matched three-way products ----------------------
    # slots are ordered newest-state-major: block s = slots [s*KS, (s+1)*KS)
    def blocks(a, extra):
        return a.reshape((B, T, S, KS) + extra)

    pmb, ps2b, plpb = blocks(pm, (D,)), blocks(ps2, (D,)), blocks(plp, ())
    smb, ss2b, slpb = blocks(sm, (D,)), blocks(ss2, (D,)), blocks(slp, ())

    # product of prefix and suffix priors (per state block, all slot pairs)
    v1 = ps2b[:, :, :, :, None, :]                  # (B,T,S,KS,1,D)
    v2 = ss2b[:, :, :, None, :, :]                  # (B,T,S,1,KS,D)
    m1 = pmb[:, :, :, :, None, :]
    m2 = smb[:, :, :, None, :, :]
    tot12 = v1 + v2
    mu12 = (m1 * v2 + m2 * v1) / tot12
    var12 = v1 * v2 / tot12
    lc12 = jnp.sum(-0.5 * jnp.log(2 * jnp.pi * tot12)
                   - (m1 - m2) ** 2 / (2 * tot12), -1)
    # then product with the observation
    xl = positions[:, :, None, None, :]             # (B,T,1,1,D)
    l2i = l2[:, :, None, None, :]
    tot_o = var12 + l2i[:, :, None]
    mu_i = (xl[:, :, None] * var12 + mu12 * l2i[:, :, None]) / tot_o
    var_i = var12 * l2i[:, :, None] / tot_o
    lw_i = (plpb[:, :, :, :, None] + slpb[:, :, :, None, :] + lc12
            + jnp.sum(-0.5 * jnp.log(2 * jnp.pi * tot_o)
                      - (xl[:, :, None] - mu12) ** 2 / (2 * tot_o), -1))

    C = S * KS * KS
    flat_i = lambda a: a.reshape((B, T, C) + a.shape[5:])  # noqa: E731
    mu_i, var_i, lw_i = flat_i(mu_i), flat_i(var_i), flat_i(lw_i)

    # embed the K = S*KS end components at c = k*KS (slot k = s*KS + i)
    def embed(mu_e, var_e, lw_e):
        mu = jnp.zeros_like(mu_i).at[:, :, ::KS].set(mu_e)
        var = jnp.ones_like(var_i).at[:, :, ::KS].set(var_e)
        lw = jnp.full_like(lw_i, -jnp.inf).at[:, :, ::KS].set(lw_e)
        return mu, var, lw

    mu_first, var_first, lw_first = embed(mu_s, var_s, lw_s)
    mu_last, var_last, lw_last = embed(mu_p, var_p, lw_p)

    k_idx = jnp.arange(T)[None, :]
    first = (k_idx == 0)[:, :, None]
    last = (k_idx == lengths[:, None] - 1)[:, :, None]
    # two-point tracks: both ends, no interior — 'first' takes precedence at
    # k=0 and 'last' at k=1, which is exactly right
    def pick(a_first, a_last, a_int):
        sel_f = first.reshape(first.shape + (1,) * (a_int.ndim - 3))
        sel_l = last.reshape(last.shape + (1,) * (a_int.ndim - 3))
        return jnp.where(sel_f, a_first, jnp.where(sel_l, a_last, a_int))

    mu = pick(mu_first, mu_last, mu_i)
    var = pick(var_first, var_last, var_i)
    lw = pick(lw_first, lw_last, lw_i)
    valid = (k_idx < lengths[:, None])[:, :, None]
    lw = jnp.where(valid, lw, -jnp.inf)
    labels = jnp.repeat(jnp.arange(S), KS * KS)
    return mu, var, lw, labels


def _moment_match_mixture(mu, var, lw):
    """Posterior-weighted mean and variance of a padded Gaussian mixture
    over its component axis (axis 2)."""
    mx = jnp.max(lw, axis=2, keepdims=True)
    w = jnp.exp(lw - jnp.where(jnp.isfinite(mx), mx, 0.0))
    sw = jnp.maximum(jnp.sum(w, axis=2), _TINY)[..., None]       # (B,T,1)
    mu_out = jnp.sum(w[..., None] * mu, axis=2) / sw
    var_out = jnp.sum(w[..., None] * var, axis=2) / sw
    return mu_out, var_out


@functools.partial(jax.jit, static_argnames=("window",))
def refine_positions(positions, lengths, loc_err2, log_trans, sig2_states,
                     *, window: int = 7):
    """Refined per-localization position posteriors.

    Returns (mu (B,T,D), sigma (B,T,D)) — the moment-matched mean and std of
    the true-position mixture at every localization
    (position_refinement, refined_localization.py:304-338).
    """
    B, T, D = positions.shape
    lengths = lengths.astype(jnp.int32)
    mu_c, var_c, lw, _ = position_mixtures(
        positions, lengths, loc_err2, log_trans, sig2_states, window=window)
    mu, var = _moment_match_mixture(mu_c, var_c, lw)
    k_idx = jnp.arange(T)[None, :]
    valid = (k_idx < lengths[:, None])[..., None]
    return jnp.where(valid, mu, 0.0), jnp.where(valid, jnp.sqrt(var), 0.0)


# ---------------------------------------------------------------------------
# Raw mixture API (reference get_pos_PDF and consumers)
# ---------------------------------------------------------------------------

def get_pos_PDF(Cs, LocErr, ds, Fs, TrMat, frame_len: int = 7,
                threshold: float = 0.2, max_nb_states: int = 1000):
    """Per-position Gaussian mixtures for a rectangular track array.

    Reference-compatible wrapper (get_pos_PDF,
    refined_localization.py:207-302): returns
    ``(all_pos_means, all_pos_stds, all_pos_weights, all_pos_Bs)`` — lists
    over positions of (n_tracks, C, D) means, (n_tracks, C, 1) stds,
    (n_tracks, C) log weights and (C,) state labels.  Components with
    -inf weight are padding (the reference returns ragged lists instead).
    Deviations: the fixed window replaces threshold pruning
    (``threshold``/``max_nb_states`` accepted for compatibility), and the
    per-component state labels are returned (the reference computes but
    drops them — its do_gifs_from_params expects 4 outputs,
    refined_localization.py:560-566).
    """
    del threshold, max_nb_states
    Cs = np.asarray(Cs)
    n, T, D = Cs.shape
    if isinstance(LocErr, (float, np.floating)):
        loc_err2 = jnp.asarray(float(LocErr) ** 2)[None, None, None]
    else:
        loc_err2 = jnp.asarray(np.asarray(LocErr, dtype=np.float64) ** 2)
        while loc_err2.ndim < 3:
            loc_err2 = loc_err2[None]
    del Fs  # fractions don't enter refinement (uniform both directions)
    lengths = jnp.full((n,), T, jnp.int32)
    log_trans = jnp.log(jnp.asarray(TrMat, dtype=jnp.float64))
    sig2_states = jnp.asarray(np.asarray(ds) ** 2, jnp.float64)
    mu, var, lw, labels = position_mixtures(
        jnp.asarray(Cs, jnp.float64), lengths, loc_err2, log_trans,
        sig2_states, window=frame_len)
    mu, var, lw = np.asarray(mu), np.asarray(var), np.asarray(lw)
    std = np.sqrt(var[..., :1])     # reference reports a 1-column std
    labels = np.asarray(labels)
    return ([mu[:, k] for k in range(T)], [std[:, k] for k in range(T)],
            [lw[:, k] for k in range(T)], [labels for _ in range(T)])


def get_all_estimates(all_pos_weights, all_pos_Bs, all_pos_means,
                      all_pos_stds):
    """Maximum-weight mixture component per position.

    Reference: get_all_estimates, refined_localization.py:340-365.  Returns
    (best_mus (n, T, D), best_sigs (n, T, 1), best_Bs (n, T) int).
    """
    best_mus, best_sigs, best_Bs = [], [], []
    for w, Bs, mus, sigs in zip(all_pos_weights, all_pos_Bs, all_pos_means,
                                all_pos_stds):
        w = np.asarray(w)
        idx = np.argmax(w, axis=1)
        rows = np.arange(len(w))
        best_mus.append(np.asarray(mus)[rows, idx])
        best_sigs.append(np.asarray(sigs)[rows, idx])
        best_Bs.append(np.asarray(Bs)[idx] if np.ndim(Bs) == 1
                       else np.asarray(Bs)[rows, idx])
    return (np.stack(best_mus, axis=1), np.stack(best_sigs, axis=1),
            np.stack(best_Bs, axis=1).astype(int))


def get_global_sigs_mus(all_pos_means, all_pos_stds, all_pos_weights,
                        idx: int = 0):
    """Moment summary of one track's per-position mixtures.

    Reference: get_global_sigs_mus, refined_localization.py:521-533 —
    means weighted by exp(LC), stds weighted by exp(LC)^2 (the reference's
    actual formula, reproduced as-is).  Padding components (weight -inf)
    contribute zero.  Returns (w_mus (T, D), w_sigs (T,)).
    """
    w_mus, w_sigs = [], []
    for mus, sigs, LC in zip(all_pos_means, all_pos_stds, all_pos_weights):
        mus = np.asarray(mus)[idx]
        sigs = np.asarray(sigs)[idx]
        LC = np.asarray(LC)[idx]
        LC = LC - np.max(LC)
        w = np.exp(LC)[:, None]
        w_sigs.append(np.sum(w ** 2 * sigs) / np.sum(w ** 2))
        w_mus.append(np.sum(w * mus, axis=0) / np.sum(w, axis=0))
    return np.array(w_mus), np.array(w_sigs)


def get_best_estimates(Cs, LocErr, ds, Fs, TrMat, frame_len: int = 10):
    """Refined positions for the argmax-posterior state sequence.

    Reference: get_best_estimates, refined_localization.py:551-559 —
    predict posteriors, take per-frame argmax states, run the fixed-Bs
    refinement.  (The reference's loop has an indentation bug that keeps
    only the last track; here all tracks are returned.)
    Returns (mus (n, T, D), sigs (n, T, D)).
    """
    from extrack_tpu.core import engine as tengine, tables as ttables
    Cs = np.asarray(Cs)
    n, T, D = Cs.shape
    lengths = jnp.full((n,), T, jnp.int32)
    Fs = np.asarray(Fs, dtype=np.float64)
    tr = np.asarray(TrMat, dtype=np.float64)
    ds = np.asarray(ds, dtype=np.float64)
    loc_err = (float(LocErr) if np.ndim(LocErr) == 0
               else np.asarray(LocErr, dtype=np.float64))
    S = tr.shape[0]
    rates = np.zeros_like(tr)       # build tables from the matrix directly
    # pBL=0.1 keeps end_ll finite; it is unused (is_bleached=0 below)
    tb = ttables.build_tables(
        jnp.zeros((S,)), jnp.asarray(loc_err), jnp.asarray(Fs),
        jnp.asarray(rates), 0.1, 1.0, cell_dims=())._replace(
        log_trans=jnp.log(jnp.asarray(tr)),
        sig2=jnp.asarray(0.5 * (ds[:, None] ** 2 + ds[None, :] ** 2)
                         ).reshape(1, -1))
    _, preds = tengine.forward(jnp.asarray(Cs, jnp.float64), lengths,
                               jnp.zeros((n,)), tb,
                               window=min(frame_len, 8), min_len=2,
                               return_preds=True)
    states = jnp.argmax(preds, axis=2)
    loc_err2 = jnp.asarray(np.asarray(loc_err) ** 2)
    while loc_err2.ndim < 3:
        loc_err2 = loc_err2[None]
    mus, sigs = refine_positions_fixed_states(
        jnp.asarray(Cs, jnp.float64), lengths, loc_err2,
        jnp.asarray(ds ** 2), states)
    return np.asarray(mus), np.asarray(sigs)


@functools.partial(jax.jit, static_argnames=())
def refine_positions_fixed_states(positions, lengths, loc_err2, sig2_states,
                                  states):
    """Refined positions for *known* state sequences (one Gaussian per
    position, no mixture).  Equivalent of the reference's fixed-Bs variant
    (get_pos_PDF_fixedBs, refined_localization.py:483-519), typically fed
    with argmax-of-posterior states.

    states: (B, T) int per-frame state labels.
    Returns (mu (B,T,D), sigma (B,T,D)).
    """
    B, T, D = positions.shape
    dtype = positions.dtype
    lengths = lengths.astype(jnp.int32)
    l2 = jnp.broadcast_to(loc_err2.astype(dtype), (B, T, D))
    sig2_states = jnp.asarray(sig2_states, dtype)
    d2 = sig2_states[states]                                # (B, T)
    sig2_step = 0.5 * (d2[:, :-1] + d2[:, 1:])              # (B, T-1)

    def one_direction(pos, l2_, s2step):
        # scan over time: emit prior (m, s2) for r_t given x_{<t}
        m0 = pos[:, 0]
        s2_0 = l2_[:, 0] + s2step[:, 0][:, None]

        def step(carry, xs):
            m, s2 = carry
            x_t, l2_t, sig2_t, live = xs
            emit = (m, s2)
            tot = l2_t + s2
            new_m = (m * l2_t + x_t * s2) / tot
            new_s2 = sig2_t[:, None] + l2_t * s2 / tot
            m = jnp.where(live[:, None], new_m, m)
            s2 = jnp.where(live[:, None], new_s2, s2)
            return (m, s2), emit

        ts = jnp.arange(1, T)
        s2pad = jnp.concatenate([s2step, s2step[:, -1:]], axis=1)
        xs = (jnp.swapaxes(pos[:, 1:], 0, 1), jnp.swapaxes(l2_[:, 1:], 0, 1),
              s2pad[:, ts].T,
              jnp.swapaxes(ts[None, :] < (lengths - 1)[:, None], 0, 1))
        _, (ms, s2s) = jax.lax.scan(step, (m0, s2_0), xs)
        pad = lambda a: jnp.concatenate(  # noqa: E731
            [jnp.zeros_like(a[:1]), a], axis=0)
        return jnp.swapaxes(pad(ms), 0, 1), jnp.swapaxes(pad(s2s), 0, 1)

    pm, ps2 = one_direction(positions, l2, sig2_step)
    rpos = _reverse_tracks(positions, lengths)
    rl2 = _reverse_tracks(l2, lengths)
    # sig2_step[t] is the EDGE t -> t+1: the reversed track's edge k -> k+1
    # is the original edge L-2-k, so reverse with edge counts (lengths - 1),
    # not node counts (which shifted every backward step variance by one)
    rstep = _reverse_tracks(sig2_step, jnp.maximum(lengths - 1, 1))
    sm, ss2 = one_direction(rpos, rl2, rstep)
    sm = _reverse_tracks(sm, lengths)
    ss2 = _reverse_tracks(ss2, lengths)

    k_idx = jnp.arange(T)[None, :]
    first = (k_idx == 0)[..., None]
    last = (k_idx == lengths[:, None] - 1)[..., None]
    # precision-weighted product of available terms (obs always present)
    prec = 1.0 / l2
    mu_num = positions * prec
    prec = prec + jnp.where(first, 0.0, 1.0 / jnp.maximum(ps2, 1e-30))
    mu_num = mu_num + jnp.where(first, 0.0, pm / jnp.maximum(ps2, 1e-30))
    prec = prec + jnp.where(last, 0.0, 1.0 / jnp.maximum(ss2, 1e-30))
    mu_num = mu_num + jnp.where(last, 0.0, sm / jnp.maximum(ss2, 1e-30))
    var = 1.0 / prec
    mu = mu_num * var
    valid = (k_idx < lengths[:, None])[..., None]
    return jnp.where(valid, mu, 0.0), jnp.where(valid, jnp.sqrt(var), 0.0)


@functools.partial(jax.jit, static_argnames=("window", "mesh",
                                             "compute_engine"))
def _refine_sharded(positions, lengths, loc_err2, log_trans, sig2_states,
                    *, window, mesh, compute_engine):
    from extrack_tpu.parallel import mesh as pmesh
    return pmesh.sharded_refine(positions, lengths, loc_err2, log_trans,
                                sig2_states, window=window, mesh=mesh,
                                compute_engine=compute_engine)


def save_gifs(all_tracks: Dict[str, np.ndarray],
              mus: Dict[str, np.ndarray],
              sigmas: Dict[str, np.ndarray],
              gif_pathnames: str = "./tracks",
              nb_pix: int = 200,
              fps: int = 1,
              max_tracks: int = 3):
    """Render per-position refined-position PDFs as animated GIFs.

    Equivalent of save_gifs (refined_localization.py:367-411), drawing the
    moment-matched Gaussian of each position over the observed track.
    """
    import matplotlib
    matplotlib.use("Agg")
    import imageio
    from matplotlib import pyplot as plt

    for key in all_tracks:
        for i in range(min(len(all_tracks[key]), max_tracks)):
            track = all_tracks[key][i]
            mu = mus[key][i]
            sig = np.broadcast_to(np.asarray(sigmas[key][i]).reshape(
                len(track), -1)[:, :1], (len(track), 1))
            lim = np.abs(track - track.mean(0)).max() * 1.2 + 1e-6
            grid = np.linspace(-lim, lim, nb_pix)
            frames = []
            for k in range(len(track)):
                fig, ax = plt.subplots(figsize=(4, 4))
                gx = np.exp(-(grid[None, :] - (mu[k, 0] - track[:, 0].mean()))
                            ** 2 / (2 * sig[k, 0] ** 2))
                gy = np.exp(-(grid[:, None] - (mu[k, 1] - track[:, 1].mean()))
                            ** 2 / (2 * sig[k, 0] ** 2))
                ax.imshow(gy * gx, extent=[-lim, lim, -lim, lim],
                          origin="lower", cmap="hot")
                ax.plot(track[:, 0] - track[:, 0].mean(),
                        track[:, 1] - track[:, 1].mean(), "c.-", lw=0.8)
                ax.set_title(f"position {k}")
                fig.canvas.draw()
                buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
                frames.append(buf)
                plt.close(fig)
            imageio.mimsave(f"{gif_pathnames}{key}_{i}.gif", frames,
                            duration=1000.0 / max(fps, 1))


def full_extrack_2_matrix(all_tracks, params, dt, all_frames=None,
                          cell_dims=(1.0, None, None), nb_states: int = 2,
                          frame_len: int = 15):
    """Predict states, refine positions, and flatten everything into one
    matrix [x, y, frame, track_id, pred_0.., x_ref, y_ref, sigma].

    Reference: full_extrack_2_matrix, refined_localization.py:536-549.
    """
    from extrack_tpu import params as tparams, predict
    from extrack_tpu.core import tables as ttables
    from extrack_tpu.io import exporters
    preds = predict.predict_Bs(all_tracks, dt, params,
                               cell_dims=cell_dims, nb_states=nb_states,
                               frame_len=min(frame_len, 8))
    vals = (params.resolve() if hasattr(params, "resolve") else params)
    Ds, Fs, rates, loc_err, _ = tparams.extract_arrays(vals, nb_states)
    tr = np.asarray(ttables.transition_matrix(rates))
    ds = np.sqrt(2.0 * np.asarray(Ds) * dt)
    mus, sigmas = position_refinement(
        all_tracks, float(np.asarray(loc_err).ravel()[0]), ds,
        np.asarray(Fs), tr, frame_len=frame_len // 2 + 3)
    df = exporters.extrack_2_pandas(all_tracks, preds, frames=all_frames)
    ref_x, ref_y, sig = [], [], []
    for k in all_tracks:
        ref_x.append(mus[k][:, :, 0].reshape(-1))
        ref_y.append(mus[k][:, :, 1].reshape(-1))
        sig.append(np.asarray(sigmas[k]).reshape(-1))
    df["X_REFINED"] = np.concatenate(ref_x)
    df["Y_REFINED"] = np.concatenate(ref_y)
    df["SIGMA_REFINED"] = np.concatenate(sig)
    return df


def do_gifs_from_params(all_tracks, params, dt, gif_pathnames="./tracks",
                        frame_len: int = 7, nb_states: int = 2,
                        nb_pix: int = 200, fps: int = 1,
                        max_tracks: int = 3):
    """Refine and render per-position PDF GIFs straight from fitted params.
    Reference: do_gifs_from_params, refined_localization.py:562-566."""
    from extrack_tpu import params as tparams
    from extrack_tpu.core import tables as ttables
    vals = (params.resolve() if hasattr(params, "resolve") else params)
    Ds, Fs, rates, loc_err, _ = tparams.extract_arrays(vals, nb_states)
    tr = np.asarray(ttables.transition_matrix(rates))
    ds = np.sqrt(2.0 * np.asarray(Ds) * dt)
    mus, sigmas = position_refinement(
        all_tracks, float(np.asarray(loc_err).ravel()[0]), ds,
        np.asarray(Fs), tr, frame_len=frame_len)
    save_gifs(all_tracks, mus, sigmas, gif_pathnames=gif_pathnames,
              nb_pix=nb_pix, fps=fps, max_tracks=max_tracks)


def _pallas_eligible(S: int, window: int, T: int, D: int) -> bool:
    K = S ** window
    KS = K // S
    from extrack_tpu.ops.pallas_refine import pick_jb, refine_block_cap
    return refine_block_cap(T, D, K, KS, pick_jb(KS)) >= 128


def pallas_window(S: int, T: int = 16, D: int = 2,
                  preferred: int = 7) -> int:
    """Largest refinement window <= ``preferred`` whose VMEM-resident
    kernel register fits (per state count; T is the planning track
    length).  S=2 keeps the reference default 7; S=3 lands on 5, S=4 on
    4 — the same step-down-the-window-per-state pattern the reference's
    own fit defaults use (ExTrack_GUI.py:1203-1212)."""
    for w in range(preferred, 1, -1):
        if _pallas_eligible(S, w, T, D):
            return w
    return 2


def default_window(nb_states: int, T: int = 16, D: int = 2) -> int:
    """Scheduled refinement window per state count: the largest window
    <= the reference's default 7 whose Pallas register fits VMEM —
    7 / 5 / 4 / 3 for 2 / 3 / 4 / 5 states.  Mirrors fit.default_window's
    step-down pattern; ``position_refinement``/``refine_batch`` use it
    when ``frame_len`` is not given.  Accuracy: the window sets how many
    neighbouring frames inform each refined position — past ~5 frames
    the extra prior information is negligible next to the localization
    error (benchmarks/refine_window_accuracy.py quantifies the delta:
    W=5 vs W=7 moves 3-state refined positions by ~1e-3 of the
    localization error), while the register (and the kernel wall time)
    grows S-fold per extra frame."""
    return pallas_window(int(nb_states), T, D, preferred=7)


def position_refinement(all_tracks: Dict[str, np.ndarray],
                        LocErr,
                        ds,
                        Fs,
                        TrMat,
                        frame_len: Optional[int] = None,
                        threshold: float = 0.1,
                        max_nb_states: int = 1000,
                        compute_engine: str = "auto",
                        sharded: bool = False
                        ) -> Tuple[Dict[str, np.ndarray],
                                   Dict[str, np.ndarray]]:
    """Reference-compatible driver (refined_localization.py:304-338).

    ``ds`` are per-state step stds sqrt(2*D*dt); ``TrMat`` is the transition
    probability matrix.  ``threshold``/``max_nb_states`` accepted for
    compatibility (the fixed window replaces threshold pruning).  Returns
    (mus, sigmas) dicts; sigmas follow the reference in reporting the
    first-dimension std per position.

    ``frame_len`` defaults to the per-state-count schedule
    (``default_window``: 7/5/4/3 for 2/3/4/5 states), so 3+-state
    refinements run the VMEM-resident kernel out of the box instead of
    the 2-state default 7 forcing the slow fallback regime.

    compute_engine: 'auto' uses the VMEM-resident Pallas refinement kernel
    on TPU (S**frame_len a multiple of 8; per-peak LocErr supported);
    'xla'/'pallas' force a path.  ``sharded=True`` shards the tracks over
    a 1-D data mesh of all available devices and refines per shard
    (parallel.mesh.sharded_refine).
    """
    del Fs, threshold, max_nb_states  # fractions don't enter refinement
    batch = tdata.from_dict(
        all_tracks,
        input_loc_err=LocErr if isinstance(LocErr, dict) else None)
    mu, sigma, B0 = refine_batch(
        batch, LocErr, ds, TrMat, frame_len=frame_len,
        compute_engine=compute_engine, sharded=sharded)
    # to_dict only regroups by lengths when values are passed — don't pull
    # the positions back through the tunnel
    lens = tdata.host_lengths(batch)[:B0]
    trimmed = tdata.TrackBatch(np.zeros((B0, 0, 0)), lens)
    return (tdata.to_dict(trimmed, mu), tdata.to_dict(trimmed, sigma[..., 0]))


def refine_batch(batch: tdata.TrackBatch, LocErr, ds, TrMat,
                 frame_len: Optional[int] = None,
                 compute_engine: str = "auto",
                 sharded: bool = False):
    """TrackBatch-native refinement core: (mu (B,T,D), sigma (B,T,D),
    n_tracks).  ``LocErr`` may be a scalar/array, or anything dict-like to
    signal that ``batch.loc_err`` holds per-peak errors.  For pipelines
    that avoid the length-keyed dict round-trips entirely.  ``frame_len``
    defaults to the per-state-count ``default_window`` schedule."""
    from extrack_tpu import config as _config
    _config.ensure_cache_tuning()
    B0 = batch.batch_size
    S = np.asarray(TrMat).shape[0]
    if frame_len is None:
        frame_len = default_window(S, batch.max_len, batch.nb_dims)
    use_pallas = (compute_engine == "pallas"
                  or (compute_engine == "auto"
                      and jax.default_backend() == "tpu"
                      and _pallas_eligible(S, frame_len, batch.max_len,
                                           batch.nb_dims)))
    if (compute_engine == "auto" and jax.default_backend() == "tpu"
            and not use_pallas):
        import warnings
        best = pallas_window(S, batch.max_len, batch.nb_dims, frame_len)
        warnings.warn(
            f"position_refinement: register for frame_len={frame_len} at "
            f"{S} states exceeds the kernel's VMEM budget; falling back "
            f"to the O(K^2/S) XLA mixture path (slower). frame_len<="
            f"{best} would run the VMEM-resident kernel.",
            RuntimeWarning, stacklevel=2)
    if use_pallas:
        # the kernel streams lane blocks itself; one dispatch per 2^20
        # tracks keeps HBM intermediates bounded without sync churn
        chunk = 1 << 20
    else:
        # the XLA pairwise prefix x suffix mixture is O(K^2/S) per
        # position with K = S^(frame_len-1): chunk the batch so
        # intermediates stay bounded (~2GB HBM; small chunks cost a
        # dispatch+sync each — 287 of them dominated the 10^6-track wall)
        chunk = max(8, (1 << 26) // (batch.max_len *
                                     max(1, S ** (2 * frame_len - 3))))
    if batch.batch_size > chunk:
        batch = batch.pad_batch_to(
            int(np.ceil(batch.batch_size / chunk)) * chunk)
    per_peak = isinstance(LocErr, dict) or (
        LocErr is None and batch.loc_err is not None)
    if per_peak:
        loc_err2 = batch.loc_err ** 2
    else:
        # host-side prep: eager device ops cost seconds through the tunnel
        loc_err2 = np.asarray(LocErr, dtype=np.float64) ** 2
        loc_err2 = jnp.asarray(loc_err2.reshape(
            (1,) * (3 - loc_err2.ndim) + loc_err2.shape),
            dtype=batch.positions.dtype)
    sig2_states = jnp.asarray(np.asarray(ds) ** 2,
                              dtype=batch.positions.dtype)
    log_trans = jnp.asarray(np.log(np.asarray(TrMat, dtype=np.float64)),
                            dtype=batch.positions.dtype)
    if sharded:
        from extrack_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh()
        batch = pmesh.shard_batch(batch, mesh)
        if per_peak:
            n = batch.batch_size
            loc_err2 = jnp.pad(
                loc_err2, ((0, n - loc_err2.shape[0]), (0, 0), (0, 0)),
                constant_values=1.0)
            loc_err2 = jax.device_put(
                loc_err2, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(pmesh.DATA_AXIS)))
        mu_s, sig_s = _refine_sharded(
            batch.positions, batch.lengths, loc_err2, log_trans,
            sig2_states, window=frame_len, mesh=mesh,
            compute_engine=("pallas" if use_pallas else "xla"))
        return np.asarray(mu_s)[:B0], np.asarray(sig_s)[:B0], B0
    mu_parts, sig_parts = [], []
    for c in range(int(np.ceil(batch.batch_size / chunk))):
        sl = slice(c * chunk, (c + 1) * chunk)
        if use_pallas:
            from extrack_tpu.ops.pallas_refine import refine_pallas
            mu_c, sig_c = refine_pallas(
                batch.positions[sl], batch.lengths[sl],
                loc_err2[sl] if per_peak else loc_err2,
                log_trans, sig2_states, window=frame_len,
                interpret=jax.default_backend() != "tpu")
        else:
            mu_c, sig_c = refine_positions(
                batch.positions[sl], batch.lengths[sl],
                loc_err2[sl] if per_peak else loc_err2,
                log_trans, sig2_states, window=frame_len)
        mu_parts.append(np.asarray(mu_c))
        sig_parts.append(np.asarray(sig_c))
    mu = np.concatenate(mu_parts)[:B0]
    sigma = np.concatenate(sig_parts)[:B0]
    return mu, sigma, B0


# ---------------------------------------------------------------------------
# Reference-named Gaussian-product helpers (extrack/refined_localization.py:
# 33-45).  Thin NumPy-facing wrappers over core.gaussian so user scripts
# that post-process refinement mixtures port unchanged.

def prod_2GaussPDF(sigma1, sigma2, mu1, mu2):
    """Product of two Gaussian PDFs -> (sigma, mu, log_const); log_const is
    summed over the trailing spatial axis (refined_localization.py:33-37)."""
    s, m, lk = gaussian_ops.product_2(jnp.asarray(sigma1),
                                      jnp.asarray(sigma2),
                                      jnp.asarray(mu1), jnp.asarray(mu2))
    return np.asarray(s), np.asarray(m), np.asarray(lk)


def prod_3GaussPDF(sigma1, sigma2, sigma3, mu1, mu2, mu3):
    """Product of three Gaussian PDFs (refined_localization.py:39-43)."""
    s, m, lk = gaussian_ops.product_3(
        jnp.asarray(sigma1), jnp.asarray(sigma2), jnp.asarray(sigma3),
        jnp.asarray(mu1), jnp.asarray(mu2), jnp.asarray(mu3))
    return np.asarray(s), np.asarray(m), np.asarray(lk)


def gaussian(x, sig, mu):
    """Isotropic Gaussian density, product over the trailing spatial axis
    (refined_localization.py:45-46)."""
    x, sig, mu = np.asarray(x), np.asarray(sig), np.asarray(mu)
    return np.prod(np.exp(-(x - mu) ** 2 / (2 * sig ** 2))
                   / np.sqrt(2 * np.pi * sig ** 2), axis=-1)


def get_pos_PDF_fixedBs(Cs, LocErr, ds, Fs, TrMat, Bs):
    """Refined (mu, sigma) per position for a KNOWN state sequence —
    reference signature and single-track return convention
    (get_pos_PDF_fixedBs, refined_localization.py:483-519): (T, D) means
    and (T, D) stds for the first track.  ``Fs``/``TrMat`` are accepted
    for compatibility (the fixed-sequence posterior does not depend on
    them); ``Bs`` may be (B, T) or the reference's (B, 1, T)."""
    Cs = jnp.asarray(Cs)
    B, T, D = Cs.shape
    Bs = np.asarray(Bs)
    if Bs.ndim == 3:
        Bs = Bs[:, 0]
    mu, sigma = refine_positions_fixed_states(
        Cs, jnp.full((B,), T, jnp.int32),
        jnp.asarray(np.asarray(LocErr, float) ** 2),
        jnp.asarray(np.asarray(ds, float) ** 2),
        jnp.asarray(Bs, jnp.int32))
    return np.asarray(mu)[0], np.asarray(sigma)[0]
