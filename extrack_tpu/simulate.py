"""Track simulation with FOV geometry, bleaching and per-peak errors.

Functional equivalent of the reference simulator (extrack/simulate_tracks.py):
``sim_fov`` reproduces sim_FOV (:123-244) — sub-stepped Brownian motion,
stroboscopic sampling, re-splitting of tracks at field-of-view exits, per-step
bleaching, chi-square distributed per-peak localization errors — and
``sim_nobias`` reproduces sim_noBias (:56-111).

Where the reference loops over tracks in Python (simulate_tracks.py:177-223),
everything here is vectorized NumPy: FOV runs are extracted with a global
change-point scan, so 10^6-track datasets simulate in seconds.  A pure-JAX
``brownian_frames`` generator is provided for on-device data generation in
benchmarks.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from extrack_tpu.core.tables import stationary_fractions


def markov_states(rng: np.random.Generator, tr_mat: np.ndarray,
                  initial_fractions: np.ndarray, nb_tracks: int,
                  length: int) -> np.ndarray:
    """(nb_tracks, length) state chains, vectorized over tracks.

    Reference: markovian_process, simulate_tracks.py:11-22.
    """
    cum_rows = np.cumsum(tr_mat, axis=1).astype(np.float32)
    cum0 = np.cumsum(initial_fractions)
    S = tr_mat.shape[0]
    states = np.empty((nb_tracks, length), dtype=np.int8)
    u = rng.random((nb_tracks, length), dtype=np.float32)
    states[:, 0] = np.searchsorted(cum0, u[:, 0], side="right").clip(
        0, len(cum0) - 1)
    for k in range(1, length):
        rows = cum_rows[states[:, k - 1]]
        states[:, k] = np.clip(
            (u[:, k, None] > rows).sum(axis=1, dtype=np.int8), 0, S - 1)
    return states


def _sub_transition(tr_mat: np.ndarray, nb_sub_steps: int) -> np.ndarray:
    sub = np.array(tr_mat, dtype=np.float64) / nb_sub_steps
    np.fill_diagonal(sub, 0.0)
    np.fill_diagonal(sub, 1.0 - sub.sum(axis=1))
    return sub


def _merge_dicts(parts):
    """Concatenate a list of (tracks, states, sigmas) dict triples."""
    out = ({}, {}, {})
    keys = sorted({k for p in parts for k in p[0]}, key=int)
    for k in keys:
        for j in range(3):
            out[j][k] = np.concatenate([p[j][k] for p in parts if k in p[0]])
    return out


def sim_nobias(track_lengths: Sequence[int] = (7, 8, 9, 10, 11),
               track_nb_dist: Sequence[int] = (1000, 800, 700, 600, 550),
               LocErr: float = 0.02,
               Ds: Sequence[float] = (0.0, 0.05),
               TrMat=None,
               initial_fractions=None,
               dt: float = 0.02,
               nb_dims: int = 2,
               nb_sub_steps: int = 30,
               seed: Optional[int] = None):
    """Fixed-length tracks, no FOV / bleaching bias.

    Reference: sim_noBias, simulate_tracks.py:56-111.  Returns (tracks,
    states) dicts keyed by track length.
    """
    rng = np.random.default_rng(seed)
    Ds = np.asarray(Ds, dtype=np.float64)
    TrMat = np.asarray(TrMat if TrMat is not None
                       else [[0.9, 0.1], [0.2, 0.8]], dtype=np.float64)
    if initial_fractions is None:
        initial_fractions = stationary_fractions(TrMat)
    sub = _sub_transition(TrMat, nb_sub_steps)
    sub_dt = dt / nb_sub_steps

    all_cs, all_bs = {}, {}
    for n_tracks, t_len in zip(track_nb_dist, track_lengths):
        L = (t_len - 1) * nb_sub_steps + 1
        states = markov_states(rng, sub, initial_fractions, n_tracks, L)
        steps = rng.normal(size=(n_tracks, L, nb_dims)) * np.sqrt(
            2.0 * Ds * sub_dt)[states][..., None]
        pos = np.cumsum(steps, axis=1)
        pos += rng.normal(0, LocErr, pos.shape)
        frame_idx = np.arange(0, L, nb_sub_steps)
        all_cs[str(t_len)] = pos[:, frame_idx]
        all_bs[str(t_len)] = states[:, frame_idx]
    return all_cs, all_bs


def sim_fov(nb_tracks: int = 10000,
            max_track_len: int = 40,
            min_track_len: int = 2,
            LocErr=0.02,
            Ds=(0.0, 0.05),
            nb_dims: int = 2,
            initial_fractions=None,
            TrMat=None,
            LocErr_std: float = 0.0,
            dt: float = 0.02,
            pBL: float = 0.1,
            cell_dims: Sequence[Optional[float]] = (0.5, None, None),
            nb_sub_steps: int = 20,
            seed: Optional[int] = None,
            verbose: bool = False,
            max_chunk_tracks: int = 200_000):
    """Simulate tracks that enter/leave a bounded FOV and photobleach.

    Reference: sim_FOV, simulate_tracks.py:123-244.  Returns (tracks, states,
    sigmas) dicts keyed by track length; sigmas are the per-peak localization
    error stds actually applied (chi-square distributed around LocErr when
    LocErr_std > 0, simulate_tracks.py:207-209).  Datasets beyond
    ``max_chunk_tracks`` simulate in memory-bounded chunks.
    """
    if nb_tracks > max_chunk_tracks:
        seeds = np.random.SeedSequence(seed).spawn(
            int(np.ceil(nb_tracks / max_chunk_tracks)))
        parts = []
        left = nb_tracks
        for ss in seeds:
            n = min(max_chunk_tracks, left)
            left -= n
            parts.append(sim_fov(
                nb_tracks=n, max_track_len=max_track_len,
                min_track_len=min_track_len, LocErr=LocErr, Ds=Ds,
                nb_dims=nb_dims, initial_fractions=initial_fractions,
                TrMat=TrMat, LocErr_std=LocErr_std, dt=dt, pBL=pBL,
                cell_dims=cell_dims, nb_sub_steps=nb_sub_steps,
                seed=np.random.default_rng(ss).integers(2 ** 31),
                verbose=False, max_chunk_tracks=max_chunk_tracks))
        out = _merge_dicts(parts)
        if verbose:
            print("number of tracks:", ", ".join(
                f"{k} pos: {len(v)}" for k, v in sorted(
                    out[0].items(), key=lambda kv: int(kv[0]))))
        return out
    rng = np.random.default_rng(seed)
    Ds = np.asarray(Ds, dtype=np.float64)
    TrMat = np.asarray(TrMat if TrMat is not None
                       else [[0.9, 0.1], [0.1, 0.9]], dtype=np.float64)
    S = TrMat.shape[0]
    if initial_fractions is None:
        initial_fractions = stationary_fractions(TrMat)
    LocErr = np.broadcast_to(np.asarray(LocErr, dtype=np.float64), (3,))
    cell = np.array([np.inf if c is None else float(c) for c in cell_dims])
    bounded = np.isfinite(cell)
    # the reference multiplies the track budget by 2 per bounded axis to
    # compensate for FOV losses (simulate_tracks.py:172)
    n_total = int(nb_tracks * 2 ** bounded.sum())

    sub = _sub_transition(TrMat, nb_sub_steps)
    sub_dt = dt / nb_sub_steps
    T = max_track_len
    L = T * nb_sub_steps

    # --- all Brownian paths at once (frame-resolution positions) ----------
    states_sub = markov_states(rng, sub, initial_fractions, n_total, L)
    # displacement j-1 -> j is governed by the state at sub-step j-1
    # (simulate_tracks.py:182); float32 throughout — simulation noise
    # dwarfs rounding
    gov = np.concatenate([states_sub[:, :1], states_sub[:, :-1]], axis=1)
    steps = rng.standard_normal((n_total, L, 3), dtype=np.float32)
    steps *= np.sqrt(2.0 * Ds * sub_dt).astype(np.float32)[gov][..., None]
    start = (rng.random((n_total, 1, 3)) * 2 * np.where(bounded, cell, 1.0)
             - np.where(bounded, cell, 1.0)).astype(np.float32)
    steps[:, 0] = 0.0
    pos = np.cumsum(steps, axis=1, dtype=np.float32) + start
    frame_idx = np.arange(0, L, nb_sub_steps)
    pos = pos[:, frame_idx]                       # (N, T, 3)
    states = states_sub[:, frame_idx]             # (N, T)

    # --- FOV membership and maximal in-FOV runs (vectorized) --------------
    in_fov = np.ones((n_total, T), dtype=bool)
    for ax in range(3):
        if bounded[ax]:
            in_fov &= (pos[:, :, ax] > 0) & (pos[:, :, ax] < cell[ax])
    padded = np.zeros((n_total, T + 2), dtype=bool)
    padded[:, 1:-1] = in_fov
    d = np.diff(padded.astype(np.int8), axis=1)
    run_track, run_start = np.nonzero(d == 1)
    _, run_end = np.nonzero(d == -1)              # same count, aligned
    run_len = run_end - run_start

    # --- bleaching: truncate each run at its first bleach event -----------
    if pBL > 0:
        u = rng.random((len(run_len), T))
        bleach_draw = (u < pBL) & (np.arange(T)[None, :] < run_len[:, None])
        any_bl = bleach_draw.any(axis=1)
        first_bl = np.argmax(bleach_draw, axis=1)
        run_len = np.where(any_bl, np.minimum(first_bl + 1, run_len), run_len)
        # once bleached, the particle is gone: drop this run's remainder AND
        # any later FOV re-entries of the same particle
        # (simulate_tracks.py:200-205 sets inFOV=[False] after a bleach)
        cum_excl = np.cumsum(any_bl) - any_bl
        _, grp_start, grp_cnt = np.unique(run_track, return_index=True,
                                          return_counts=True)
        base = np.repeat(cum_excl[grp_start], grp_cnt)
        prior_bleach = cum_excl - base
        run_len = np.where(prior_bleach > 0, 0, run_len)
    keep = run_len >= min_track_len
    run_track, run_start, run_len = (run_track[keep], run_start[keep],
                                     run_len[keep])

    # --- per-peak sigmas and measurement noise (vectorized per length) ----
    if len(run_len) == 0:
        raise ValueError("no tracks survived the FOV/bleaching filters")
    k_chi = 2.0 / (LocErr_std ** 2 + 1e-20)
    out_c: Dict[str, np.ndarray] = {}
    out_b: Dict[str, np.ndarray] = {}
    out_s: Dict[str, np.ndarray] = {}
    if verbose:
        uniq, cnt = np.unique(run_len, return_counts=True)
        print("number of tracks:",
              ", ".join(f"{u} pos: {c}" for u, c in zip(uniq, cnt)))
    for L in np.unique(run_len):
        sel = run_len == L
        rows = run_start[sel][:, None] + np.arange(L)[None, :]
        trk = run_track[sel][:, None]
        p = pos[trk, rows]                       # (n, L, 3)
        st = states[trk, rows]                   # (n, L)
        if LocErr_std > 0:
            sigma = (rng.chisquare(k_chi, p.shape).astype(np.float32)
                     * (LocErr / k_chi).astype(np.float32))
        else:
            sigma = np.broadcast_to(LocErr.astype(np.float32), p.shape)
        noisy = p + rng.standard_normal(p.shape, dtype=np.float32) * sigma
        key = str(int(L))
        out_c[key] = noisy[:, :, :nb_dims]
        out_b[key] = st
        out_s[key] = sigma[:, :, :nb_dims]
    return out_c, out_b, out_s


# ---------------------------------------------------------------------------
# On-device simulation (pure JAX)
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.partial(
    jax.jit, static_argnames=("n", "T", "nsub", "R", "min_len", "loc_err_std",
                              "pBL", "bounded", "nb_dims"))
def _sim_fov_chunk(key, n, T, nsub, R, min_len, d2sub, cum_tr, cum_frac,
                   cell, loc_err, loc_err_std, pBL, bounded, nb_dims=3):
    """One fully-jitted simulation chunk: n particles -> n*R padded runs.

    Device equivalent of the host path in :func:`sim_fov` (itself mirroring
    sim_FOV, simulate_tracks.py:123-244).  Sub-state transitions run at
    sub-step resolution inside a scan over frames; FOV membership and
    bleaching act at frame resolution (as in the host version); each
    particle's first R maximal in-FOV runs become fixed-shape output rows
    (length 0 when absent), so every shape is static.

    Returns (positions (n*R, T, nb_dims), states (n*R, T) int8,
    sigmas (n*R, T, nb_dims) or None when loc_err_std == 0,
    lengths (n*R,) int32).  Outputs are sliced to ``nb_dims`` and the
    constant-sigma array elided inside the jit so a 10^6-track chunk's HBM
    footprint stays bounded (a full (n*R, T, 3) sigma copy OOM'd 16GB).
    """
    f32 = jnp.float32
    S = cum_tr.shape[0]
    k_state, k_disp, k_start, k_bl, k_sig, k_noise = jax.random.split(key, 6)

    # --- sub-stepped Markov chain, emitted at frame resolution -------------
    u0 = jax.random.uniform(k_state, (n,))
    s0 = jnp.sum(u0[:, None] > cum_frac[None, :], axis=1).astype(jnp.int32)

    frame_keys = jax.random.split(jax.random.fold_in(k_state, 1), T - 1)

    def frame_step(s, key_t):
        def sub(j, sv):
            s, var = sv
            # displacement into sub-step j+1 is governed by the state at j
            # (simulate_tracks.py:182)
            var = var + d2sub[s]
            u = jax.random.uniform(jax.random.fold_in(key_t, j), (n,))
            s = jnp.sum(u[:, None] > cum_tr[s], axis=1).astype(jnp.int32)
            return (s, var)
        s, var = jax.lax.fori_loop(0, nsub, sub, (s, jnp.zeros((n,), f32)))
        return s, (s, var)

    _, (s_frames, var_frames) = jax.lax.scan(frame_step, s0, frame_keys)
    states = jnp.concatenate([s0[None], s_frames], axis=0).T   # (n, T)
    var = var_frames.T                                          # (n, T-1)

    # --- frame positions ----------------------------------------------------
    bcell = jnp.where(jnp.asarray(bounded), cell, 1.0).astype(f32)
    start = (jax.random.uniform(k_start, (n, 3)) * 2.0 - 1.0) * bcell
    disp = jax.random.normal(k_disp, (n, T - 1, 3), f32) \
        * jnp.sqrt(var)[..., None]
    r = jnp.concatenate([jnp.zeros((n, 1, 3), f32),
                         jnp.cumsum(disp, axis=1)], axis=1) + start[:, None]

    # --- FOV membership + bleach truncation (frame resolution) -------------
    fov = jnp.ones((n, T), bool)
    for ax in range(3):
        if bounded[ax]:
            fov &= (r[:, :, ax] > 0) & (r[:, :, ax] < cell[ax])
    if pBL > 0:
        u = jax.random.uniform(k_bl, (n, T))
        event = (u < pBL) & fov
        any_bl = event.any(axis=1)
        t0 = jnp.argmax(event, axis=1)
        cutoff = jnp.where(any_bl, t0, T - 1)
        # the bleached frame itself is still observed (run_len = first_bl+1
        # in the host path); everything after it is gone
        fov &= jnp.arange(T)[None, :] <= cutoff[:, None]

    # --- run decomposition, fixed cap of R runs per particle ---------------
    is_start = fov & ~jnp.concatenate(
        [jnp.zeros((n, 1), bool), fov[:, :-1]], axis=1)
    run_id = jnp.cumsum(is_start, axis=1) - 1                   # (n, T)
    t_idx = jnp.arange(T)[None, :]
    starts, lens = [], []
    for rr in range(R):
        mask = fov & (run_id == rr)
        ln = jnp.sum(mask, axis=1)
        st = jnp.argmax(is_start & (run_id == rr), axis=1)
        lens.append(jnp.where(ln >= min_len, ln, 0))
        starts.append(st)
    starts = jnp.stack(starts, axis=1)                          # (n, R)
    lens = jnp.stack(lens, axis=1).astype(jnp.int32)            # (n, R)

    # --- per-peak errors + measurement noise at particle level -------------
    # (runs never overlap, so per-particle-frame draws are identical in
    # distribution to the host's per-run-peak draws)
    if loc_err_std > 0:
        k_chi = 2.0 / (loc_err_std ** 2)
        sigma = (jax.random.chisquare(k_sig, k_chi, (n, T, 3), f32)
                 * (loc_err / k_chi))
    else:
        sigma = jnp.broadcast_to(jnp.asarray(loc_err, f32), (n, T, 3))
    noisy = r + jax.random.normal(k_noise, (n, T, 3), f32) * sigma

    # --- gather runs into fixed-shape rows ----------------------------------
    idx = jnp.clip(starts[:, :, None] + t_idx[None], 0, T - 1)  # (n, R, T)
    tmask = t_idx[None] < lens[:, :, None]                      # (n, R, T)

    def take(a):                                  # (n, T, ...) -> (n, R, T, ...)
        full_idx = idx.reshape((n, R, T) + (1,) * (a.ndim - 2))
        return jnp.take_along_axis(a[:, None], full_idx, axis=2)

    # outputs are flattened to 2D (rows, T*nb_dims): row gathers on a 3D
    # (N, T, 2) array force an XLA relayout copy that pads the size-2 minor
    # dim to 128 lanes (64x HBM — OOM at 10^6 tracks); 2D rows tile cleanly
    out_pos = jnp.where(tmask[..., None], take(noisy[..., :nb_dims]), 0.0)
    out_states = jnp.where(tmask, take(states), 0).astype(jnp.int8)
    out_sig = None
    if loc_err_std > 0:
        out_sig = jnp.where(tmask[..., None], take(sigma[..., :nb_dims]),
                            1.0).reshape(n * R, T * nb_dims)
    return (out_pos.reshape(n * R, T * nb_dims),
            out_states.reshape(n * R, T), out_sig, lens.reshape(n * R))


def sim_fov_batch(nb_tracks: int = 10000,
                  max_track_len: int = 40,
                  min_track_len: int = 2,
                  LocErr=0.02,
                  Ds=(0.0, 0.05),
                  nb_dims: int = 2,
                  initial_fractions=None,
                  TrMat=None,
                  LocErr_std: float = 0.0,
                  dt: float = 0.02,
                  pBL: float = 0.1,
                  cell_dims: Sequence[Optional[float]] = (0.5, None, None),
                  nb_sub_steps: int = 20,
                  seed: Optional[int] = None,
                  runs_per_particle: int = 4,
                  chunk: int = 250_000,
                  max_buckets: int = 4):
    """On-device sim_FOV: returns padded TrackBatch buckets, never leaving
    the accelerator.

    Same model as :func:`sim_fov` / the reference (simulate_tracks.py:123-244)
    — sub-stepped Brownian motion over a Markov state chain, uniform seeding
    over twice the FOV per bounded axis, re-splitting at FOV exits, per-frame
    bleaching, chi-square per-peak errors — but built from static-shape JAX
    ops so 10^6-track datasets generate in seconds on TPU.  Each particle
    contributes up to ``runs_per_particle`` FOV runs (re-entries beyond that
    are dropped; with default geometry that is <0.1% of tracks).

    Returns ``(batches, states)``: lists of TrackBatch (length-bucketed, runs
    sorted by descending length) and matching (B, T_bucket) int8 ground-truth
    state labels.  Empty output rows (length 0) are trimmed.
    """
    from extrack_tpu import data as tdata

    Ds = np.asarray(Ds, dtype=np.float64)
    TrMat = np.asarray(TrMat if TrMat is not None
                       else [[0.9, 0.1], [0.1, 0.9]], dtype=np.float64)
    if initial_fractions is None:
        initial_fractions = stationary_fractions(TrMat)
    LocErr3 = np.broadcast_to(np.asarray(LocErr, dtype=np.float32), (3,))
    cell = np.array([1.0 if c is None else float(c) for c in cell_dims],
                    dtype=np.float32)
    bounded = tuple(c is not None for c in cell_dims)
    n_total = int(nb_tracks * 2 ** sum(bounded))

    sub = _sub_transition(TrMat, nb_sub_steps)
    cum_tr = jnp.asarray(np.cumsum(sub, axis=1), jnp.float32)
    cum_frac = jnp.asarray(np.cumsum(initial_fractions), jnp.float32)
    d2sub = jnp.asarray(2.0 * Ds * (dt / nb_sub_steps), jnp.float32)
    T = max_track_len
    R = min(runs_per_particle, max(1, (T + 1) // 2))

    key = jax.random.PRNGKey(seed if seed is not None else 0)
    parts = []
    left = n_total
    c = 0
    while left > 0:
        n = min(chunk, left)
        left -= n
        parts.append(_sim_fov_chunk(
            jax.random.fold_in(key, c), n, T, nb_sub_steps, R,
            max(2, min_track_len), d2sub, cum_tr, cum_frac,
            jnp.asarray(cell), jnp.asarray(LocErr3),
            float(LocErr_std), float(pBL), bounded, nb_dims=nb_dims))
        c += 1
    pos = jnp.concatenate([p[0] for p in parts])
    states = jnp.concatenate([p[1] for p in parts])
    sig = (jnp.concatenate([p[2] for p in parts])
           if LocErr_std > 0 else None)
    lens = jnp.concatenate([p[3] for p in parts])
    del parts      # free the per-chunk copies before the bucket gathers

    # compact + length-sort on device; only the (T+1)-entry length histogram
    # crosses to the host (a full lens[order] device->host copy of 8M int32
    # took ~80s through the remote-TPU tunnel)
    lens = lens.astype(jnp.int32)
    order = jnp.argsort(-lens)
    counts = np.asarray(jnp.bincount(lens, length=T + 1))
    n_alive = int(counts[1:].sum())
    if n_alive == 0:
        raise ValueError("no tracks survived the FOV/bleaching filters")
    widths = np.arange(T, 0, -1)
    widths = widths[counts[widths] > 0]          # descending, non-empty
    lens_host = np.repeat(widths, counts[widths])
    data_max = int(widths[0])
    order = order[:n_alive]
    lens_sorted = lens[order]        # device-resident, sliced per bucket

    cuts = _bucket_cuts(lens_host, max_buckets)
    batches, states_out = [], []
    i0 = 0
    for i1 in cuts:
        t_max = int(lens_host[i0])
        sel = order[i0:i1]
        lens_b = lens_sorted[i0:i1]
        batches.append(tdata.TrackBatch(
            positions=_bucket_take(pos, sel, t_max, T, nb_dims),
            lengths=lens_b,
            loc_err=(_bucket_take(sig, sel, t_max, T, nb_dims)
                     if LocErr_std > 0 else None),
            is_bleached=(lens_b < data_max).astype(jnp.float32)))
        states_out.append(_bucket_take(states, sel, t_max, T, 1)[..., 0])
        i0 = i1
    return batches, states_out


@_functools.partial(jax.jit, static_argnames=("t_max", "T", "width"))
def _bucket_take(flat2d, sel, t_max, T, width):
    """Compact one length bucket from 2D (rows, T*width) chunk output.

    The gather runs on the 2D array (clean lane tiling) and only the
    gathered bucket is reshaped back to (rows, T, width) — an eager row
    gather on the 3D array would relayout-copy it with the size-``width``
    dim padded to 128 lanes (64x HBM)."""
    out = flat2d[sel].reshape(-1, T, width)[:, :t_max]
    return out


def _bucket_cuts(lens_desc: np.ndarray, max_buckets: int):
    """Cut END indices (final = len) minimizing total padded work
    sum(n_i * T_i) over <= max_buckets contiguous groups of the descending
    per-track length array.  Thin adapter over the shared bucket-partition
    DP (data.partition_cuts, which works on the ascending distinct-length
    list): ascending distinct cut e maps to descending position N - csum[e].
    """
    from extrack_tpu import data as tdata
    uniq, cnt = np.unique(lens_desc, return_counts=True)   # ascending
    cuts = tdata.partition_cuts(uniq.tolist(), cnt.tolist(), max_buckets)
    csum = np.concatenate([[0], np.cumsum(cnt)])
    N = len(lens_desc)
    return sorted(int(N - csum[e]) for e in [0] + cuts if e < len(uniq))


def brownian_frames(key, nb_tracks: int, track_len: int, Ds, Fs, tr_mat,
                    loc_err: float, dt: float, nb_dims: int = 2):
    """Pure-JAX fixed-length track generator (frame-resolution transitions).

    Device-resident data generation for benchmarks — no host round trips.
    Returns (positions (B, T, D), states (B, T)).
    """
    Ds = jnp.asarray(Ds)
    tr = jnp.asarray(tr_mat)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s0 = jax.random.categorical(k1, jnp.log(jnp.asarray(Fs)),
                                shape=(nb_tracks,))
    trans_keys = jax.random.split(k2, track_len - 1)

    def chain(s, k):
        s_next = jax.random.categorical(k, jnp.log(tr)[s], axis=-1)
        return s_next, s_next

    _, rest = jax.lax.scan(chain, s0, trans_keys)
    states = jnp.concatenate([s0[None], rest], axis=0).T      # (B, T)
    d2 = 2.0 * Ds * dt
    step_var = (d2[states[:, :-1]] + d2[states[:, 1:]]) / 2.0
    disp = jax.random.normal(k3, (nb_tracks, track_len - 1, nb_dims)) \
        * jnp.sqrt(step_var)[..., None]
    r = jnp.concatenate([jnp.zeros((nb_tracks, 1, nb_dims)),
                         jnp.cumsum(disp, axis=1)], axis=1)
    x = r + loc_err * jax.random.normal(k4, r.shape)
    return x, states


# ---------------------------------------------------------------------------
# Reference-named utility API (extrack/simulate_tracks.py:11-54,113-121).
# Same signatures as the reference so user scripts port unchanged; the
# implementations ride the package's vectorized primitives.

def get_fractions_from_TrMat(TrMat):
    """Steady-state occupancies of a transition-probability matrix.

    Reference: extrack/simulate_tracks.py:24-54 (analytic for 2/3 states,
    power iteration otherwise); here one eigen/solve-based stationary
    distribution covers every state count.
    """
    return np.asarray(stationary_fractions(np.asarray(TrMat, float)))


def markovian_process(TrMat, initial_fractions, nb_tracks, track_len,
                      seed: Optional[int] = None):
    """State chains of a discrete Markov process, (nb_tracks, track_len) int.

    Reference: extrack/simulate_tracks.py:11-22.  Vectorized over tracks AND
    time via inverse-CDF sampling on cumulative rows (the reference loops
    over time with a per-state accumulation); optional ``seed`` for
    reproducibility.
    """
    rng = np.random.default_rng(seed)
    TrMat = np.asarray(TrMat, float)
    cum_rows = np.cumsum(TrMat, axis=1)
    states = np.empty((nb_tracks, track_len), dtype=int)
    # clip before cum_rows is indexed: under-normalized fractions can make
    # searchsorted return nb_states (the reference assigns that remainder
    # to the last state, simulate_tracks.py:11-22)
    states[:, 0] = np.minimum(
        np.searchsorted(np.cumsum(np.asarray(initial_fractions)),
                        rng.random(nb_tracks), side="right"),
        len(TrMat) - 1)
    u = rng.random((nb_tracks, track_len - 1))
    for k in range(1, track_len):
        rows = cum_rows[states[:, k - 1]]
        states[:, k] = (u[:, k - 1:k] >= rows).sum(axis=1)
    return np.clip(states, 0, len(TrMat) - 1)


def is_in_FOV(positions, cell_dims):
    """Per-position FOV membership mask with a trailing sentinel ``False``.

    Reference: extrack/simulate_tracks.py:113-121 (the sentinel marks the
    end of the track for the exit-split logic).
    """
    positions = np.asarray(positions)
    in_fov = np.ones(len(positions) + 1, dtype=bool)
    for i, l in enumerate(cell_dims):
        if l is not None:
            cur = (positions[:, i] < l) & (positions[:, i] > 0)
            in_fov &= np.concatenate([cur, [False]])
    return in_fov


# Reference capitalization (extrack/simulate_tracks.py:56,123)
sim_FOV = sim_fov
sim_noBias = sim_nobias
