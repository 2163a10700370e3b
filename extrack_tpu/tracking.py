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
    tb = ModelTables(
        log_trans=log_trans, log_frac=jnp.log(jnp.asarray(Fs)),
        sig2=displacement_var(d2[None], nb_substeps),
        log_survive=jnp.log(p_stay * (1.0 - pBL)),
        end_ll=jsp.special.logsumexp(lt_branch + end_core[:, None], axis=0),
        loc_err2=jnp.asarray(np.atleast_3d(np.asarray(LocErr) ** 2)))
    lengths = jnp.full((B,), T, jnp.int32)
    isbl = jnp.full((B,), float(isBL), Cs.dtype)
    return _engine.forward(Cs, lengths, isbl, tb, window=frame_len,
                           nb_substeps=nb_substeps, min_len=min_len)


def cum_Proba_Cs(params, all_tracks, dt, cell_dims, input_LocErr, nb_states,
                 nb_substeps, frame_len, verbose=1, workers=1, Matrix_type=1,
                 threshold=0.2, max_nb_states=120,
                 max_number_of_tracks_per_matrix=2000):
    """Negative total log likelihood over a dataset — reference signature
    (extrack/tracking.py:991-1088).  Chunking/threshold knobs are accepted
    for compatibility; the batched scan needs neither."""
    del workers, threshold, max_nb_states, max_number_of_tracks_per_matrix
    from extrack_tpu import data as tdata
    import numpy as np
    import jax.numpy as jnp
    batch = tdata.from_dict(all_tracks, input_loc_err=input_LocErr,
                            dt=dt if isinstance(dt, dict) else None)
    spec = params
    values = spec.resolve() if isinstance(spec, Parameters) else spec
    Ds, Fs, rates, loc_err, pBL = extract_arrays(
        values, nb_states,
        input_loc_err=batch.loc_err if input_LocErr is not None else None)
    dt_arr = batch.dt if batch.dt is not None else jnp.asarray(dt)
    tb = build_tables(Ds, loc_err, Fs, rates, pBL, dt_arr,
                      cell_dims=cell_dims, nb_substeps=nb_substeps,
                      matrix_type=Matrix_type)
    lens = tdata.host_lengths(batch)
    min_len = int(lens[lens >= 2].min()) if (lens >= 2).any() else 2
    out = -float(batch_log_likelihood(batch, tb, window=frame_len,
                                      nb_substeps=nb_substeps,
                                      min_len=min_len))
    if verbose:
        print(out)
    return out
