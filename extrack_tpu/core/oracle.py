"""Brute-force exact-enumeration oracle (NumPy, float64).

Independent correctness reference for the scan engine: instead of the
Gaussian-product recursion, each candidate hidden sub-step sequence is scored
directly through the closed-form multivariate normal distribution of the
observed displacements (positions are jointly Gaussian given the sequence).
Exponential in track length — test-sized tracks only.

Model matched (see extrack/tracking.py:109-318 for the reference recursion):
  * hidden Markov chain over S diffusive states, ``n`` sub-steps per frame,
    initial fractions F, per-substep transition matrix T_sub;
  * displacement variance per frame step = mean of adjacent-pair averages of
    2*D*dt over the n+1 sub-states spanning the step (tracking.py:500-506);
  * isotropic Gaussian localization error per peak per dim;
  * flat prior on the initial true position (first observation integrates
    to 1, tracking.py:101-107);
  * per-step FOV survival x (1-pBL) for frame steps >= min_len
    (tracking.py:518-524,565-568) and the bleaching/leaving end term over one
    extra hidden extension when the track ended early (tracking.py:613-631).
"""
from __future__ import annotations

import itertools

import numpy as np
from scipy.stats import norm


def _logsumexp(a, axis=None):
    mx = np.max(a, axis=axis, keepdims=True)
    mx = np.where(np.isfinite(mx), mx, 0.0)
    out = np.log(np.sum(np.exp(a - mx), axis=axis)) + np.squeeze(mx, axis)
    return out


def stay_prob(sub_d, cell_dims, grid_size=1000):
    p = np.ones_like(np.asarray(sub_d, dtype=np.float64))
    for L in cell_dims:
        if L is None:
            continue
        xs = np.linspace(L / (2 * grid_size), L - L / (2 * grid_size),
                         grid_size)
        d = np.asarray(sub_d)[..., None] + 1e-200
        p = p * np.mean(norm.cdf((L - xs) / d) - norm.cdf(-xs / d), axis=-1)
    return p


def track_log_likelihood(x, loc_err, Ds, Fs, tr_sub, pBL=0.1, is_bleached=1,
                         cell_dims=(1.0,), nb_substeps=1, dt=0.02,
                         min_len=3, return_posteriors=False,
                         return_sequence_logls=False):
    """Exact log likelihood of one track by summing over all hidden sequences.

    x: (T, D); loc_err: scalar or (T, D) std; Ds: (S,); Fs: (S,);
    tr_sub: (S, S) per-substep transition probabilities; dt: scalar or (T-1,).
    """
    x = np.asarray(x, dtype=np.float64)
    T, D = x.shape
    S = len(Ds)
    n = nb_substeps
    L = (T - 1) * n + 1                       # hidden chain length
    dt = np.broadcast_to(np.asarray(dt, dtype=np.float64), (T - 1,))
    l2 = np.broadcast_to(np.asarray(loc_err, dtype=np.float64) ** 2, (T, D))
    d2 = 2.0 * np.asarray(Ds) * dt[:, None]   # (T-1, S)
    log_T = np.log(tr_sub)
    log_F = np.log(Fs)

    sub_pats = list(itertools.product(range(S), repeat=n))
    sub_d = np.array([np.sqrt(np.mean([2.0 * Ds[s] * np.median(dt)
                                       for s in pat])) for pat in sub_pats])
    p_stay = stay_prob(sub_d, cell_dims)
    lsurv = np.log(p_stay * (1.0 - pBL))
    pat_index = {pat: i for i, pat in enumerate(sub_pats)}

    # end term per final hidden state: logsumexp over one extra extension
    end_ll = np.full(S, -np.inf)
    for s in range(S):
        terms = []
        for pat in sub_pats:
            chain = (s,) + pat
            lt = sum(log_T[chain[j], chain[j + 1]] for j in range(n))
            terms.append(lt + np.log(pBL + (1 - p_stay[pat_index[pat]])
                                     * (1 - pBL)))
        end_ll[s] = _logsumexp(np.array(terms))

    logls = []
    seqs = []
    ys = x[1:] - x[0]                          # (T-1, D)
    for beta in itertools.product(range(S), repeat=L):
        seqs.append(beta)
        # transition + fraction terms
        lp = log_F[beta[0]]
        for j in range(L - 1):
            lp += log_T[beta[j], beta[j + 1]]
        # displacement variances per frame step
        sig2 = np.empty(T - 1)
        for t in range(T - 1):
            states = beta[t * n:(t + 1) * n + 1]
            pair_means = [(d2[t, states[j]] + d2[t, states[j + 1]]) / 2.0
                          for j in range(n)]
            sig2[t] = np.mean(pair_means)
        # multivariate normal of displacements, per dim
        cum = np.cumsum(sig2)
        cov_base = np.minimum.outer(np.arange(1, T), np.arange(1, T))
        for d in range(D):
            cov = cum[cov_base - 1] + l2[0, d] + np.diag(l2[1:, d])
            sign, logdet = np.linalg.slogdet(2 * np.pi * cov)
            sol = np.linalg.solve(cov, ys[:, d])
            lp += -0.5 * (ys[:, d] @ sol + logdet)
        # survival terms for frame steps c = 2..T-1 with c >= min_len
        for c in range(2, T):
            if c >= min_len:
                pat = tuple(beta[(c - 1) * n + 1:c * n + 1])
                lp += lsurv[pat_index[pat]]
        if is_bleached:
            lp += end_ll[beta[-1]]
        logls.append(lp)

    logls = np.array(logls)
    if return_sequence_logls:
        return logls, seqs
    logl = _logsumexp(logls)
    if not return_posteriors:
        return logl
    w = np.exp(logls - np.max(logls))
    w /= w.sum()
    post = np.zeros((T, S))
    for wi, beta in zip(w, seqs):
        for t in range(T):
            post[t, beta[t * n]] += wi
    return logl, post


def segment_histogram(x, loc_err, Ds, Fs, tr_sub, pBL=0.1, is_bleached=1,
                      cell_dims=(1.0,), dt=0.02, min_len=3, nb_substeps=1):
    """Exact posterior-weighted segment-length histogram of one track:
    enumerate hidden sub-state sequences, normalize weights per track, add
    each same-state run's weight to hist[run_len-1, state].  Segments are
    decoded at FRAME resolution (the stroboscopic sub-state beta[t*n],
    matching the frame-state convention of the posteriors)."""
    T = len(x)
    S = len(Ds)
    n = nb_substeps
    logls, seqs = track_log_likelihood(
        x, loc_err, Ds, Fs, tr_sub, pBL=pBL, is_bleached=is_bleached,
        cell_dims=cell_dims, nb_substeps=n, dt=dt, min_len=min_len,
        return_sequence_logls=True)
    w = np.exp(logls - np.max(logls))
    w /= w.sum()
    hist = np.zeros((T, S))
    for wi, beta in zip(w, seqs):
        frames = beta[::n]
        run_start = 0
        for t in range(1, T + 1):
            if t == T or frames[t] != frames[t - 1]:
                hist[t - run_start - 1, frames[run_start]] += wi
                run_start = t
    return hist


def refined_positions(x, loc_err, Ds, tr, dt=0.02):
    """Exact refined true-position posterior per localization (nb_substeps=1).

    For every state sequence beta: (r_k, x) are jointly Gaussian, so the
    conditional mean/var of r_k given all observations follows from the
    covariance identities; sequences are weighted by P(x|beta) * transition
    chain (no fractions / survival — the reference refinement scheme,
    refined_localization.py:93-96).  Returns (mu (T,D), sigma (T,D)).
    """
    x = np.asarray(x, dtype=np.float64)
    T, D = x.shape
    S = len(Ds)
    l2 = np.broadcast_to(np.asarray(loc_err, dtype=np.float64) ** 2, (T, D))
    d2 = 2.0 * np.asarray(Ds) * dt
    log_T = np.log(tr)
    ys = x[1:] - x[0]

    mus = np.zeros((0, T, D))
    variances = np.zeros((0, T, D))
    logws = []
    base = np.minimum.outer(np.arange(1, T), np.arange(1, T))
    for beta in itertools.product(range(S), repeat=T):
        sig2 = np.array([(d2[beta[t]] + d2[beta[t + 1]]) / 2.0
                         for t in range(T - 1)])
        cum = np.concatenate([[0.0], np.cumsum(sig2)])
        lw = sum(log_T[beta[j], beta[j + 1]] for j in range(T - 1))
        mu_b = np.zeros((T, D))
        var_b = np.zeros((T, D))
        for d in range(D):
            cov_y = cum[base] + l2[0, d] + np.diag(l2[1:, d])
            sol = np.linalg.solve(cov_y, ys[:, d])
            lw_d = -0.5 * (ys[:, d] @ sol
                           + np.linalg.slogdet(2 * np.pi * cov_y)[1])
            lw += lw_d
            for k in range(T):
                # u = r_k - x_0:  Cov(u, y_j) = cum[min(j,k)] + l2_0,
                # Var(u) = cum[k] + l2_0  (e_j independent of r_k for j>0)
                c_uy = cum[np.minimum(np.arange(1, T), k)] + l2[0, d]
                var_u = cum[k] + l2[0, d]
                gain = np.linalg.solve(cov_y, c_uy)
                mu_b[k, d] = x[0, d] + c_uy @ sol
                var_b[k, d] = var_u - c_uy @ gain
        mus = np.concatenate([mus, mu_b[None]])
        variances = np.concatenate([variances, var_b[None]])
        logws.append(lw)

    logws = np.array(logws)
    w = np.exp(logws - logws.max())
    w /= w.sum()
    mu = np.einsum('s,std->td', w, mus)
    var = np.einsum('s,std->td', w, variances)
    return mu, np.sqrt(var)


def batch_log_likelihood(xs, lengths, is_bleached, loc_err, **kw):
    """Oracle over a padded batch: sum over tracks of per-track exact logL."""
    total = 0.0
    for i in range(len(xs)):
        T = int(lengths[i])
        if T < 2:
            continue
        # per-track only when a batch axis is present (B, T, D); a shared
        # per-frame (T, D) array slices on TIME, never the track index
        nd = np.ndim(loc_err)
        if nd == 3:
            le = loc_err[i][:T]
        elif nd == 2:
            le = loc_err[:T]
        else:
            le = loc_err
        total += track_log_likelihood(xs[i][:T], le,
                                      is_bleached=float(is_bleached[i]), **kw)
    return total
