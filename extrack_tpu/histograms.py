"""State-duration (segment-length) histograms.

Equivalent of the reference histogram engine (extrack/histograms.py:26-457):
the posterior-weighted distribution of consecutive same-state segment lengths
— a non-Markovian diagnostic of the fitted model.

TPU redesign: where the reference keeps a *growing* list of explicit state
sequences pruned by a NumPy ``argsort`` to the ``max_nb_states`` most likely
(extrack/histograms.py:194-206), this engine keeps a *static* register of
``max_nb_states`` explicit sequences inside a ``lax.scan``: branch xS,
Gaussian update, then ``jax.lax.top_k`` on the same one-step-lookahead
posterior score the reference sorts by.  Unused slots carry -inf weight, so
results are exact until the true sequence count exceeds the register.
Segment decoding (histograms.py:253-284) is a vectorized cummax over end
markers plus one scatter-add — no per-sequence Python loops.

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
from extrack_tpu.core import tables as ttables
from extrack_tpu.core.tables import ModelTables, state_codes

_NEG = -1e30


@functools.partial(jax.jit,
                   static_argnames=("max_nb_states", "min_len"))
def segment_histogram(positions, lengths, is_bleached, tb: ModelTables,
                      *, max_nb_states: int = 512, min_len: int = 3):
    """Posterior-weighted segment-length histogram.

    Returns (T, S): row k-1 is the expected number of segments of length k
    in each state, summed over tracks (per-track posterior normalized, as in
    histograms.py:280-284).
    """
    B, T, D = positions.shape
    S = tb.nb_states
    M = max_nb_states
    if M < S * S:
        raise ValueError(f"max_nb_states ({M}) must be >= nb_states^2")
    dtype = positions.dtype
    lengths = lengths.astype(jnp.int32)
    is_bleached = is_bleached.astype(dtype)
    l2 = jnp.broadcast_to(tb.loc_err2.astype(dtype), (B, T, D))
    log_trans = tb.log_trans
    lsurv = tb.log_survive                    # (S,) for nb_substeps=1
    sig2 = tb.sig2.astype(dtype)
    R = sig2.shape[-2]

    def sig2_at(t):
        row = sig2[..., jnp.minimum(t, R - 1), :] if R > 1 else sig2[..., 0, :]
        return row                             # (P,) or (B, P)

    # ---- initial register: all S^2 two-frame sequences ------------------
    pairs = state_codes(S, 2)                  # (S^2, 2) newest first
    lp0 = ttables.init_log_prob(log_trans, tb.log_frac, 1)    # (S^2,)
    lp = jnp.full((B, M), _NEG, dtype)
    lp = lp.at[:, :S * S].set(lp0.astype(dtype))
    ll = jnp.zeros((B, M), dtype)
    seqs = jnp.zeros((B, M, T), jnp.int8)
    seqs = seqs.at[:, :S * S, 0].set(pairs[:, 1].astype(jnp.int8))
    seqs = seqs.at[:, :S * S, 1].set(pairs[:, 0].astype(jnp.int8))
    newest = jnp.broadcast_to(
        jnp.pad(pairs[:, 0], (0, M - S * S)).astype(jnp.int8), (B, M))
    sig2_pat = jnp.take(sig2_at(0), jnp.asarray(
        np.pad(np.arange(S * S), (0, M - S * S))), axis=-1)
    m = jnp.broadcast_to(positions[:, 0, None, :], (B, M, D))
    s2 = jnp.broadcast_to(l2[:, 0, None, :]
                          + jnp.reshape(sig2_pat, (-1, M))[..., None],
                          (B, M, D))
    w_final = jnp.zeros((B, M), dtype)
    end_k = tb.end_ll.astype(dtype)            # (S,)

    def step(carry, xs):
        m, s2, lp, ll, seqs, newest, w_final = carry
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

        # branch: children (B, S, M) — new state axis first
        tot = l2_t[:, None, :] + s2
        new_m = (m * l2_t[:, None, :] + x_t[:, None, :] * s2) / tot
        tail = l2_t[:, None, :] * s2 / tot
        lc = jnp.sum(-0.5 * jnp.log(2 * jnp.pi * tot)
                     - (x_t[:, None, :] - m) ** 2 / (2 * tot), -1)
        gate = (t + 1 >= min_len).astype(dtype)
        lt = log_trans.astype(dtype)[newest].swapaxes(1, 2)    # (B,S,M)
        pat = (jax.lax.broadcasted_iota(jnp.int32, (S, M), 0) * S
               + newest[:, None, :].astype(jnp.int32))          # (B,S,M)
        if s2row.ndim == 1:                                      # (P,)
            sig2_new = s2row[pat]                                # (B,S,M)
        else:                                                    # (B,P)
            sig2_new = jnp.take_along_axis(
                s2row[:, None, :], pat.reshape(B, 1, S * M),
                axis=-1).reshape(B, S, M)
        lp_child = (lp[:, None, :] + lt + lc[:, None, :])
        ll_child = ll[:, None, :] + gate * lsurv.astype(dtype)[
            jax.lax.broadcasted_iota(jnp.int32, (S, M), 0)][None]
        s2_child = sig2_new[..., None] + tail[:, None]          # (B,S,M,D)

        # lookahead pruning score (histograms.py:183-199): LP + next-obs
        # integral; padded slots stay at -inf
        tot_n = l2_next[:, None, None, :] + s2_child
        look = lp_child + jnp.sum(
            -0.5 * jnp.log(2 * jnp.pi * tot_n)
            - (x_next[:, None, None, :] - new_m[:, None]) ** 2 / (2 * tot_n),
            -1)
        scores = look.reshape(B, S * M)
        _, idx = jax.lax.top_k(scores, M)                       # (B, M)

        def pick(child):   # child (B, S, M, ...) -> (B, M, ...)
            flat = child.reshape((B, S * M) + child.shape[3:])
            return jnp.take_along_axis(
                flat, idx.reshape((B, M) + (1,) * (child.ndim - 3)), axis=1)

        new_state = (idx // M).astype(jnp.int8)
        parent = idx % M
        seqs_new = jnp.take_along_axis(seqs, parent[..., None], axis=1)
        seqs_new = jax.lax.dynamic_update_slice(
            seqs_new, new_state[..., None], (jnp.zeros((), t.dtype),) * 2
            + (t + 1,))
        keep = is_interior[:, None]
        m = jnp.where(keep[..., None],
                      pick(jnp.broadcast_to(new_m[:, None], (B, S, M, D))), m)
        s2 = jnp.where(keep[..., None], pick(s2_child), s2)
        lp = jnp.where(keep, pick(lp_child), lp)
        ll = jnp.where(keep, pick(ll_child), ll)
        seqs = jnp.where(keep[..., None], seqs_new, seqs)
        newest = jnp.where(keep, new_state, newest)
        return (m, s2, lp, ll, seqs, newest, w_final), None

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

    carry = (m, s2, lp, ll, seqs, newest, w_final)
    carry, _ = jax.lax.scan(jax.checkpoint(step), carry, xs)
    _, _, _, _, seqs, _, w_final = carry
    return decode_segments(seqs, w_final, lengths, S)


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

def len_hist(all_tracks: Dict[str, np.ndarray],
             params,
             dt,
             cell_dims=(0.5, None, None),
             nb_states: int = 2,
             max_nb_states: int = 500,
             workers: int = 1,
             nb_substeps: int = 1,
             input_LocErr=None,
             matrix_type: int = 1) -> np.ndarray:
    """Reference-compatible driver (extrack/histograms.py:294-373).

    Returns (max_track_len, S).  ``workers`` accepted for compatibility;
    nb_substeps must be 1 (as in every reference usage).
    """
    del workers
    if nb_substeps != 1:
        raise NotImplementedError("histograms support nb_substeps=1")
    batch = tdata.from_dict(all_tracks, input_loc_err=input_LocErr,
                            dt=dt if isinstance(dt, dict) else None)
    chunk = 8192
    if batch.batch_size > chunk:
        batch = batch.pad_batch_to(
            int(np.ceil(batch.batch_size / chunk)) * chunk)
        if batch.loc_err is not None:
            batch.loc_err = jnp.where(batch.loc_err > 0, batch.loc_err, 1.0)
    values = (params.resolve()
              if isinstance(params, tparams.Parameters) else params)
    Ds, Fs, rates, loc_err, pBL = tparams.extract_arrays(
        values, nb_states,
        input_loc_err=batch.loc_err if input_LocErr is not None else None)
    cell = tuple(c for c in cell_dims if c is not None)
    dt_arr = batch.dt if batch.dt is not None else jnp.asarray(dt)
    tb = ttables.build_tables(Ds, loc_err, Fs, rates, pBL, dt_arr,
                              cell_dims=cell, matrix_type=matrix_type)
    lens = np.asarray(batch.lengths)
    min_len = int(lens[lens >= 2].min()) if (lens >= 2).any() else 2
    # round the register up to a lane-friendly multiple of 128
    M = max(int(np.ceil(max_nb_states / 128)) * 128, 128)
    # the histogram scan carries (M, T) sequences per track: chunk large
    # batches (the reference chunks at 50 tracks, histograms.py:338)
    per_peak = tb.loc_err2.shape[0] > 1
    hist = None
    for c in range(int(np.ceil(batch.batch_size / chunk))):
        sl = slice(c * chunk, (c + 1) * chunk)
        tb_c = tb._replace(
            loc_err2=tb.loc_err2[sl] if per_peak else tb.loc_err2,
            sig2=tb.sig2[sl] if tb.sig2.ndim == 3 else tb.sig2)
        h = segment_histogram(batch.positions[sl], batch.lengths[sl],
                              batch.is_bleached[sl], tb_c,
                              max_nb_states=M, min_len=min_len)
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
