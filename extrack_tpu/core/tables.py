"""Precomputed model tables for the likelihood engine.

Everything that depends only on (parameters, dt, geometry) and not on the
track data is folded into small dense tables outside the time scan:

* per-substep transition matrix with the reference's five discretizations
  (``Matrix_type``, extrack/tracking.py:952-975),
* per-frame-step displacement variances for every pattern of ``nb_substeps+1``
  hidden sub-states (extrack/tracking.py:495-506),
* FOV survival probabilities integrated on a 1000-point grid
  (extrack/tracking.py:518-524),
* the bleaching / leaving-FOV end term folded over one extra hidden transition
  (extrack/tracking.py:613-631).

All functions are differentiable w.r.t. the physical parameters so the whole
objective admits ``jax.grad``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

import jax.numpy as jnp
import jax.scipy as jsp

_EPS_D = 1e-200


def state_codes(nb_states: int, width: int) -> np.ndarray:
    """(S**width, width) matrix of all state sequences, newest state first.

    Equivalent information to the reference's ``get_all_Bs``
    (extrack/tracking.py:746-757), as a static numpy constant.
    """
    k = np.arange(nb_states ** width)
    pows = nb_states ** np.arange(width - 1, -1, -1)
    return (k[:, None] // pows[None, :]) % nb_states


def transition_matrix(rates, nb_substeps: int = 1, matrix_type: int = 1):
    """Build the per-substep transition probability matrix from a rate matrix.

    ``rates`` is (S, S) with off-diagonal transition rates per frame; the
    diagonal is ignored.  Mirrors extract_params' ``Matrix_type`` variants
    (extrack/tracking.py:952-975): 0 linear, 1 ``1-exp(-r)`` (default),
    2 matrix exponential, 3 arithmetic and 4 geometric blends of 0 and 2.
    """
    rates = jnp.asarray(rates)
    S = rates.shape[0]
    eye = jnp.eye(S, dtype=rates.dtype)
    off = rates * (1.0 - eye) / nb_substeps

    def _linear(m):
        return m + eye * (1.0 - jnp.sum(m, axis=1, keepdims=True))

    if matrix_type == 0:
        return _linear(off)
    if matrix_type == 1:
        return _linear(1.0 - jnp.exp(-off))
    generator = off - eye * jnp.sum(off, axis=1, keepdims=True)
    expm = jsp.linalg.expm(generator)
    if matrix_type == 2:
        return expm
    lin = _linear(off)
    if matrix_type == 3:
        return 0.5 * (lin + expm)
    if matrix_type == 4:
        return jnp.sqrt(lin * expm)
    raise ValueError(f"unknown matrix_type {matrix_type}")


def stationary_fractions(tr_mat):
    """Stationary distribution of a transition matrix via eigen decomposition.

    Replaces the reference's power iteration (simulate_tracks.py:24-54) and
    the hand-derived 2/3-state formulas with a general solution.
    """
    tr = np.asarray(tr_mat, dtype=np.float64)
    vals, vecs = np.linalg.eig(tr.T)
    idx = int(np.argmin(np.abs(vals - 1.0)))
    pi = np.real(vecs[:, idx])
    pi = np.abs(pi)
    return pi / pi.sum()


def displacement_var(d2, nb_substeps: int):
    """Per-pattern displacement variance for one frame step.

    ``d2``: (..., S) squared diffusion step length 2*D*dt per state.
    Returns (..., S**(nb_substeps+1)) where pattern digits are ordered newest
    sub-state first.  A transition is assumed at the middle of each sub-step,
    so the variance is the mean of adjacent-pair averages
    (extrack/tracking.py:500-506).
    """
    d2 = jnp.asarray(d2)
    S = d2.shape[-1]
    n = nb_substeps
    codes = state_codes(S, n + 1)                      # (P, n+1)
    w = np.zeros((S ** (n + 1), S))
    for j in range(n + 1):
        scale = 0.5 if (j == 0 or j == n) else 1.0
        np.add.at(w, (np.arange(S ** (n + 1)), codes[:, j]), scale / n)
    w = jnp.asarray(w, dtype=d2.dtype)                  # (P, S)
    return d2 @ w.T


def fov_stay_prob(sub_d, cell_dims: Sequence[float], grid_size: int = 1000):
    """Probability of staying inside the field of view for one frame step.

    ``sub_d``: (...,) effective diffusion std per pattern.  For each bounded
    cell dimension L, averages Phi((L-x)/d) - Phi(-x/d) over a uniform grid of
    x in (0, L) — numerically identical to the reference grid
    (extrack/tracking.py:518-524).
    """
    sub_d = jnp.asarray(sub_d)
    p = jnp.ones_like(sub_d)
    for L in cell_dims:
        if L is None:
            continue
        xs = jnp.linspace(L / (2 * grid_size), L - L / (2 * grid_size),
                          grid_size, dtype=sub_d.dtype)
        d = sub_d[..., None] + _EPS_D
        cur = jnp.mean(jsp.stats.norm.cdf((L - xs) / d)
                       - jsp.stats.norm.cdf(-xs / d), axis=-1)
        p = p * cur
    return p


class ModelTables(NamedTuple):
    """Everything the scan engine needs besides the track data.

    Shapes use S states, n sub-steps, A = S**n, P = S**(n+1), and Tm1 frame
    steps (or 1 when dt is constant; rows broadcast).
    """
    log_trans: jnp.ndarray        # (S, S) per-substep log transition probs
    log_frac: jnp.ndarray         # (S,) initial state log fractions
    sig2: jnp.ndarray             # (Tm1|1, P) displacement variance per pattern
    log_survive: jnp.ndarray      # (A,) log(p_stay * (1 - pBL)) per new pattern
    end_ll: jnp.ndarray           # (S,) folded end term per newest state
    loc_err2: jnp.ndarray         # broadcastable to (B, T, D): squared loc err

    @property
    def nb_states(self) -> int:
        return self.log_trans.shape[0]


def build_tables(Ds,
                 loc_err,
                 Fs,
                 rates,
                 pBL,
                 dt,
                 cell_dims: Sequence[float] = (1.0,),
                 nb_substeps: int = 1,
                 matrix_type: int = 1,
                 dt_repr: Optional[float] = None) -> ModelTables:
    """Assemble ModelTables from physical parameters.

    Ds: (S,) diffusion coefficients.
    loc_err: localization error std — scalar, (D,), or an array broadcastable
        to (B, T, D) for per-peak errors.
    Fs: (S,) initial fractions.  rates: (S, S) off-diagonal transition rates
    per frame.  pBL: bleaching probability per frame.  dt: scalar or (Tm1,)
    or (B, Tm1) frame interval(s).
    """
    # runs at trace time, before the enclosing program compiles — the one
    # choke point every driver passes through
    from extrack_tpu import config
    config.ensure_cache_tuning()
    Ds = jnp.asarray(Ds)
    Fs = jnp.asarray(Fs)
    dt = jnp.asarray(dt)
    S = Ds.shape[0]
    n = nb_substeps

    # log(0) entries (forbidden transition, zero fraction, pBL edge cases)
    # are floored to a finite -1e15: exp still underflows to exactly 0, but
    # -inf would produce NaN both in the Pallas kernels' max-shifted sums
    # (inf - inf) and in the engines' gated terms (0 * -inf).  -1e15 is far
    # below any achievable finite log-weight, and log-probabilities
    # accumulate at most ~T levels of it (~1e17, well inside float32).
    # Double-where so the zero branch's 1/0 never meets the VJP (a plain
    # maximum(log(p), cap) backpropagates 0 * inf = NaN through expm-mixed
    # rates).
    def cap_log(p):
        safe = jnp.where(p > 0, p, 1.0)
        return jnp.where(p > 0, jnp.log(safe), -1e15)

    tr = transition_matrix(rates, nb_substeps=n, matrix_type=matrix_type)
    log_trans = cap_log(tr)
    log_frac = cap_log(Fs)

    # squared step lengths 2*D*dt, with dt possibly per step / per track
    d2 = 2.0 * Ds * dt[..., None]                      # (..., S)
    if d2.ndim == 1:
        d2 = d2[None]                                   # (1, S)
    sig2 = displacement_var(d2, n)                      # (..., P)

    # survival table over the S**n patterns of new sub-states
    if dt_repr is None:
        dt_r = jnp.median(dt) if dt.ndim else dt
    else:
        dt_r = jnp.asarray(dt_repr)
    d2_r = 2.0 * Ds * dt_r                              # (S,)
    sub_codes = state_codes(S, n)                       # (A, n)
    sub_d = jnp.sqrt(jnp.mean(d2_r[sub_codes], axis=-1))
    p_stay = fov_stay_prob(sub_d, cell_dims)            # (A,)
    log_survive = cap_log(p_stay * (1.0 - pBL))

    # end term: one extra hidden extension of n sub-steps, folded per
    # newest state: logsumexp_a [ sum log T(s -> a) + log(pBL + (1-p_stay_a)(1-pBL)) ]
    lt_branch = branch_log_trans(log_trans, n)          # (A, S)
    end_core = cap_log(pBL + (1.0 - p_stay) * (1.0 - pBL))   # (A,)
    end_ll = jsp.special.logsumexp(lt_branch + end_core[:, None], axis=0)

    loc_err = jnp.asarray(loc_err)
    loc_err2 = loc_err ** 2
    while loc_err2.ndim < 3:
        loc_err2 = loc_err2[None]

    return ModelTables(log_trans=log_trans, log_frac=log_frac, sig2=sig2,
                       log_survive=log_survive, end_ll=end_ll,
                       loc_err2=loc_err2)


def branch_log_trans(log_trans, nb_substeps: int):
    """(A, S): log prob of appending sub-state pattern ``a`` (digits newest
    first) after previous newest state ``s``: T[s, a_{n-1}] ... T[a_1, a_0]."""
    S = log_trans.shape[0]
    codes = state_codes(S, nb_substeps)                 # (A, n)
    out = log_trans.T[codes[:, -1]]                     # (A, S): T[s, a_last]
    for j in range(nb_substeps - 1):
        out = out + log_trans[codes[:, j + 1], codes[:, j]][:, None]
    return out


def init_log_prob(log_trans, log_frac, nb_substeps: int):
    """(P,) log prob of the initial window of n+1 sub-states
    (newest first): log F[oldest] + transition chain."""
    S = log_trans.shape[0]
    codes = state_codes(S, nb_substeps + 1)             # (P, n+1)
    out = log_frac[codes[:, -1]]
    for j in range(nb_substeps):
        out = out + log_trans[codes[:, j + 1], codes[:, j]]
    return out
