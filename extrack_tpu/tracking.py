"""Reference-compatible namespace: extrack.tracking equivalents.

Users of the reference import everything from ``extrack.tracking``
(extrack/__init__.py:1); this module re-exports the equivalents so switching
frameworks is a one-line import change.  The engine-level functions live in
extrack_tpu.core; drivers in extrack_tpu.fit / extrack_tpu.predict.
"""
from extrack_tpu.fit import param_fitting, make_objective, fit  # noqa: F401
from extrack_tpu.predict import predict_Bs, predict_batch  # noqa: F401
from extrack_tpu.params import (Parameters, generate_params,  # noqa: F401
                                get_params, extract_arrays)
from extrack_tpu.core.engine import forward, batch_log_likelihood  # noqa: F401
from extrack_tpu.core.tables import (build_tables,  # noqa: F401
                                     transition_matrix, stationary_fractions)


def Proba_Cs(Cs, LocErr, ds, Fs, TrMat, pBL, isBL, cell_dims, nb_substeps=1,
             frame_len=6, min_len=3, threshold=0.2, max_nb_states=120):
    """Per-track log likelihoods from raw model arrays — reference signature
    (extrack/tracking.py:769-787).  ``ds`` are per-state step stds
    sqrt(2*D*dt); ``TrMat`` is the transition probability matrix.
    ``threshold``/``max_nb_states`` accepted for compatibility."""
    del threshold, max_nb_states
    import numpy as np
    import jax.numpy as jnp
    from extrack_tpu.core import engine as _engine
    from extrack_tpu.core.tables import (ModelTables, branch_log_trans,
                                         displacement_var, fov_stay_prob,
                                         state_codes)
    import jax.scipy as jsp
    Cs = jnp.asarray(Cs)
    B, T, D = Cs.shape
    S = TrMat.shape[0]
    d2 = jnp.asarray(ds, dtype=Cs.dtype) ** 2
    log_trans = jnp.log(jnp.asarray(TrMat, dtype=Cs.dtype))
    sub_codes = state_codes(S, nb_substeps)
    sub_d = jnp.sqrt(jnp.mean(d2[sub_codes], axis=-1))
    p_stay = fov_stay_prob(sub_d, [c for c in cell_dims if c is not None])
    lt_branch = branch_log_trans(log_trans, nb_substeps)
    end_core = jnp.log(pBL + (1.0 - p_stay) * (1.0 - pBL))
    # prepend axes up to (B|1, T|1, D|1): np.atleast_3d would put a (D,)
    # per-dimension error on the TIME axis ((1, D, 1))
    le2 = np.asarray(LocErr, dtype=float) ** 2
    le2 = le2.reshape((1,) * (3 - le2.ndim) + le2.shape)
    tb = ModelTables(
        log_trans=log_trans, log_frac=jnp.log(jnp.asarray(Fs)),
        sig2=displacement_var(d2[None], nb_substeps),
        log_survive=jnp.log(p_stay * (1.0 - pBL)),
        end_ll=jsp.special.logsumexp(lt_branch + end_core[:, None], axis=0),
        loc_err2=jnp.asarray(le2))
    lengths = jnp.full((B,), T, jnp.int32)
    isbl = jnp.full((B,), float(isBL), Cs.dtype)
    return _engine.forward(Cs, lengths, isbl, tb, window=frame_len,
                           nb_substeps=nb_substeps, min_len=min_len)


_batch_cache: dict = {}


def clear_batch_cache():
    """Drop cached TrackBatches (see _cached_from_dict).  Call after
    editing track arrays in place if you want a guaranteed re-upload."""
    _batch_cache.clear()


def _cached_from_dict(all_tracks, input_LocErr, dt):
    """Build (or reuse) the TrackBatch for a length-keyed dict.

    cum_Proba_Cs is the reference's objective function — user scripts call
    it once per optimizer iteration with the SAME dataset, and re-running
    from_dict every call re-uploads the whole dataset through the TPU
    tunnel.  Content is fingerprinted by shape/dtype, head/tail bytes and
    a 256-element strided sample of every array — O(1) per call and it
    catches any realistic (bulk) modification; a surgical few-element
    interior edit can in principle collide, so call clear_batch_cache()
    after in-place edits for a hard guarantee."""
    import numpy as np
    from extrack_tpu import data as tdata

    def fp(d):
        if not isinstance(d, dict):
            return None
        out = []
        for k in sorted(d):
            a = np.asarray(d[k])
            flat = a.ravel()
            step = max(1, flat.size // 256)
            sample = flat[::step][:256]
            out.append((k, a.shape, str(a.dtype),
                        flat[:4].tobytes() if a.size else b"",
                        flat[-4:].tobytes() if a.size else b"",
                        sample.tobytes()))
        return tuple(out)

    key = (fp(all_tracks), fp(input_LocErr), fp(dt))
    batch = _batch_cache.get(key)
    if batch is None:
        batch = tdata.from_dict(all_tracks, input_loc_err=input_LocErr,
                                dt=dt if isinstance(dt, dict) else None)
        if len(_batch_cache) >= 4:
            _batch_cache.pop(next(iter(_batch_cache)))
        _batch_cache[key] = batch
    return batch


def cum_Proba_Cs(params, all_tracks, dt, cell_dims, input_LocErr, nb_states,
                 nb_substeps, frame_len, verbose=1, workers=1, Matrix_type=1,
                 threshold=0.2, max_nb_states=120,
                 max_number_of_tracks_per_matrix=2000):
    """Negative total log likelihood over a dataset — reference signature
    (extrack/tracking.py:991-1088).  Chunking/threshold knobs are accepted
    for compatibility; the batched scan needs neither.

    One jitted dispatch per call (predict.forward_from_values fuses
    parameter extraction + table build + engine); the TrackBatch is cached
    across calls so optimizer loops don't re-upload the dataset."""
    del workers, threshold, max_nb_states, max_number_of_tracks_per_matrix
    from extrack_tpu import data as tdata
    from extrack_tpu import predict as tpredict
    import numpy as np
    batch = _cached_from_dict(all_tracks, input_LocErr, dt)
    spec = params
    values = spec.resolve() if isinstance(spec, Parameters) else dict(spec)
    # reference validity guard (tracking.py:1017): reject negative derived
    # fractions (F_last = 1 - sum F can dip below 0 at >= 3 states)
    fracs = [float(values[f"F{i}"]) for i in range(nb_states)
             if f"F{i}" in values]
    if fracs and min(fracs) < 0:
        if verbose:
            print("inf (invalid fractions)")
        return float("inf")
    lens = tdata.host_lengths(batch)
    min_len = tdata.default_min_len(lens)
    dt_arr = batch.dt if batch.dt is not None else float(dt)
    logl = tpredict.forward_from_values(
        values, batch.positions, batch.lengths, batch.is_bleached,
        batch.loc_err if input_LocErr is not None else None, dt_arr,
        nb_states=nb_states, cell_dims=tuple(cell_dims),
        window=frame_len, min_len=min_len, matrix_type=Matrix_type,
        nb_substeps=nb_substeps, return_preds=False)
    out = -float(np.asarray(logl)[lens > 0].sum())
    if verbose:
        print(out)
    return out


def extract_params(params, dt, nb_states, nb_substeps, input_LocErr=None,
                   Matrix_type=1):
    """Resolve fit parameters into model arrays — reference signature and
    return convention (extrack/tracking.py:913-986): ``(LocErr, ds, Fs,
    TrMat, pBL)`` with ``ds = sqrt(2*D*dt)`` and ``TrMat`` the sub-step
    transition-probability matrix under the requested ``Matrix_type``
    discretization.

    ``LocErr`` follows the reference container shapes: a one-element list
    holding a (1, 1, S_err) array for fitted errors, or the per-peak input
    list (optionally mapped through slope/offset) when ``input_LocErr`` is
    given.  ``dt`` may be a scalar or a list of per-step (B, T-1) arrays.
    """
    import numpy as np
    import jax.numpy as jnp
    values = params.resolve() if isinstance(params, Parameters) else dict(params)
    # the scalar loc_err slot is unused when per-peak input is given (the
    # LocErr list below is built from input_LocErr); feed a dummy so
    # slope/offset-only parameter sets (LocErr_type=4) resolve
    Ds, Fs, rates, _loc, pBL = extract_arrays(
        values, nb_states,
        input_loc_err=1.0 if input_LocErr is not None else None)
    TrMat = np.asarray(transition_matrix(
        jnp.asarray(rates), nb_substeps=nb_substeps,
        matrix_type=Matrix_type))
    Ds, Fs, pBL = np.asarray(Ds), np.asarray(Fs), float(pBL)

    if input_LocErr is not None:
        per_peak = (list(input_LocErr.values())
                    if isinstance(input_LocErr, dict) else list(input_LocErr))
        if "slope_LocErr" in values:
            slope = float(values["slope_LocErr"])
            offset = float(values["offset_LocErr"])
            LocErr = [np.clip(np.asarray(l) * slope + offset, 1e-6, np.inf)
                      for l in per_peak]
        else:
            LocErr = per_peak
    else:
        le = sorted(k for k in values if k.startswith("LocErr"))
        LocErr = [np.array([float(values[k]) for k in le])[None, None]]

    if isinstance(dt, list):
        ds = [np.sqrt(2 * Ds[None, None] * np.asarray(t)[:, :, None])
              for t in dt]
    else:
        ds = np.sqrt(2 * Ds * dt)
    return LocErr, ds, Fs, TrMat, pBL


def get_all_Bs(nb_Cs, nb_states):
    """All state sequences of length ``nb_Cs`` as an integer matrix,
    (nb_states**nb_Cs, nb_Cs), least-significant position first — reference
    layout (extrack/tracking.py:746-757)."""
    import numpy as np
    ids = np.arange(nb_states ** nb_Cs)
    return (ids[:, None] // nb_states ** np.arange(nb_Cs)) % nb_states


def get_Ts_from_Bs(all_Bs, TrMat):
    """Log transition probability of each sequence under ``TrMat`` —
    reference signature (extrack/tracking.py:759-767); ``all_Bs`` may carry
    any leading batch axes."""
    import numpy as np
    all_Bs = np.asarray(all_Bs)
    lt = np.log(np.asarray(TrMat))
    return lt[all_Bs[..., :-1], all_Bs[..., 1:]].sum(axis=-1)


def ds_froms_states(ds, cur_states):
    """Per-step displacement std**2 of state sequences: consecutive sub-step
    variances averaged (transition mid-step), then averaged over the
    sequence axis — reference semantics (extrack/tracking.py:58-65).
    Returns (..., 1) like the reference's trailing spatial axis."""
    import numpy as np
    d2 = np.asarray(ds)[np.asarray(cur_states)] ** 2
    d2 = (d2[..., 1:] + d2[..., :-1]) / 2.0
    return d2.mean(axis=-1)[..., None]


def log_integrale_dif(Ci, l2, cur_d2s, m_arr, s2_arr):
    """One Gaussian-marginalization step — reference signature
    (extrack/tracking.py:76-98); returns (new_m, new_s2, log_const) with the
    constant summed over the trailing spatial axis."""
    import jax.numpy as jnp
    from extrack_tpu.core import gaussian as g
    new_m, new_s2, log_c = g.propagate(
        jnp.asarray(Ci), jnp.asarray(l2), jnp.asarray(cur_d2s),
        jnp.asarray(m_arr), jnp.asarray(s2_arr))
    return new_m, new_s2, log_c


def first_log_integrale_dif(Ci, l2, cur_d2s):
    """First-step convolution under a flat prior — reference signature
    (extrack/tracking.py:101-107); returns (m_arr, s2_arr)."""
    import jax.numpy as jnp
    from extrack_tpu.core import gaussian as g
    return g.first_convolve(jnp.asarray(Ci), jnp.asarray(l2),
                            jnp.asarray(cur_d2s))
