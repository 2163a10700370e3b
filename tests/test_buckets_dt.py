"""Length bucketing, per-step dt, and LocErr-type coverage."""
import numpy as np
import pytest

import jax.numpy as jnp

from extrack_tpu import data as tdata, fit, params as xp, simulate
from extrack_tpu.core import engine, oracle, tables
from tests.test_engine import _sim_tracks


def test_bucketed_objective_equals_single_batch():
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=300, max_track_len=20, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=15)
    spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.005, 0.05])
    single = tdata.from_dict(tracks)
    buckets = tdata.from_dict_bucketed(tracks, max_buckets=4)
    assert 2 <= len(buckets) <= 4
    # padded work strictly reduced
    single_work = single.batch_size * single.max_len
    bucket_work = sum(b.batch_size * b.max_len for b in buckets)
    assert bucket_work < single_work
    # isBL convention preserved: only dataset-max tracks censored
    for b in buckets:
        isbl = np.asarray(b.is_bleached)
        lens = np.asarray(b.lengths)
        assert np.all((isbl == 0) == (lens == single.max_len))

    z = spec.to_unconstrained()
    obj1 = fit.make_objective(single, spec, 0.02, 2, cell_dims=(0.5,),
                              window=4)
    obj2 = fit.make_objective(buckets, spec, 0.02, 2, cell_dims=(0.5,),
                              window=4)
    np.testing.assert_allclose(float(obj1(z)), float(obj2(z)), rtol=1e-12)


def test_per_step_dt_matches_oracle():
    rng = np.random.default_rng(70)
    Ds, Fs = np.array([0.0, 0.1]), np.array([0.4, 0.6])
    rates = np.array([[0.0, 0.1], [0.15, 0.0]])
    xs, _ = _sim_tracks(rng, 3, 5, 2, Ds, np.array([[.9, .1], [.15, .85]]),
                        Fs, 0.02, 0.02)
    dts = np.array([0.02, 0.05, 0.02, 0.08])      # (T-1,) varying intervals
    tr_sub = np.asarray(tables.transition_matrix(jnp.asarray(rates)))
    tb = tables.build_tables(Ds, 0.02, Fs, rates, 0.1, jnp.asarray(dts),
                             cell_dims=(0.8,), nb_substeps=1)
    assert tb.sig2.shape == (4, 4)
    got = engine.forward(jnp.asarray(xs), jnp.full(3, 5),
                         jnp.ones(3), tb, window=5, nb_substeps=1, min_len=3)
    for i in range(3):
        want = oracle.track_log_likelihood(
            xs[i], 0.02, Ds, Fs, tr_sub, pBL=0.1, is_bleached=1.0,
            cell_dims=(0.8,), nb_substeps=1, dt=dts, min_len=3)
        np.testing.assert_allclose(float(got[i]), want, rtol=1e-10)


def test_locerr_type2_per_dim_fit():
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=400, max_track_len=10, min_track_len=3,
        LocErr=np.array([0.02, 0.04, 0.02]), Ds=(0.0, 0.08),
        TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), dt=0.02, pBL=0.05,
        cell_dims=(0.5, None, None), seed=16)
    spec = xp.generate_params(nb_states=2, LocErr_type=2, nb_dims=2,
                              D_max=1.0, estimated_Ds=[0.005, 0.05])
    res = fit.param_fitting(tracks, 0.02, params=spec, nb_states=2,
                            frame_len=4, cell_dims=(0.5,), verbose=0)
    v = res.params.valuesdict()
    assert v["LocErr0"] == pytest.approx(0.02, rel=0.25)
    assert v["LocErr1"] == pytest.approx(0.04, rel=0.25)


def test_locerr_type4_affine_fit():
    # wide per-peak spread (sigma std ~ 50%) so slope/offset identify
    tracks, _, sigs = simulate.sim_fov(
        nb_tracks=800, max_track_len=10, min_track_len=3, LocErr=0.025,
        LocErr_std=0.5, Ds=(0.0, 0.08),
        TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), dt=0.02, pBL=0.05,
        cell_dims=(0.5, None, None), seed=17)
    spec = xp.generate_params(nb_states=2, LocErr_type=4, D_max=1.0,
                              estimated_Ds=[0.005, 0.05],
                              slope_offsets_estimates=[0.8, 0.003])
    res = fit.param_fitting(tracks, 0.02, params=spec, nb_states=2,
                            frame_len=4, cell_dims=(0.5,),
                            input_LocErr=sigs, verbose=0)
    v = res.params.valuesdict()
    # true per-peak sigmas are passed in, so slope ~ 1, offset ~ 0
    assert v["slope_LocErr"] == pytest.approx(1.0, abs=0.3)
    mean_sig = float(np.mean(np.concatenate(
        [s.ravel() for s in sigs.values()])))
    pred = v["slope_LocErr"] * mean_sig + v["offset_LocErr"]
    assert pred == pytest.approx(mean_sig, rel=0.15)


def test_canonical_shapes_preserve_results():
    """canonicalize() pads (T, B) to the ladder without changing logL."""
    import jax.numpy as jnp
    from extrack_tpu import data as tdata
    from extrack_tpu.core import engine, tables as ttables
    rng = np.random.default_rng(5)
    tracks = {"5": np.cumsum(rng.normal(0, 0.05, (7, 5, 2)), axis=1),
              "9": np.cumsum(rng.normal(0, 0.05, (6, 9, 2)), axis=1)}
    tb = ttables.build_tables(
        jnp.asarray([0.0, 0.1]), jnp.asarray(0.02), jnp.asarray([0.4, 0.6]),
        jnp.asarray([[0.0, 0.1], [0.15, 0.0]]), jnp.asarray(0.1),
        jnp.asarray(0.02), cell_dims=(0.8,))
    plain = tdata.from_dict_bucketed(tracks, max_buckets=2)
    canon = tdata.from_dict_bucketed(tracks, max_buckets=2,
                                     canonical_shapes=True)
    assert all(b.max_len % 4 == 0 for b in canon)
    assert all(b.batch_size >= 128 for b in canon)
    for b, c in zip(plain, canon):
        l_b = engine.forward(b.positions, b.lengths, b.is_bleached, tb,
                             window=5, min_len=3)
        l_c = engine.forward(c.positions, c.lengths, c.is_bleached, tb,
                             window=5, min_len=3)
        np.testing.assert_allclose(float(jnp.sum(l_c)), float(jnp.sum(l_b)),
                                   rtol=1e-12)
    assert tdata.canonical_batch(129) == 192
    assert tdata.canonical_batch(400) == 512
    assert tdata.canonical_len(41) == 48
    assert tdata.canonical_len(10) == 12


def test_from_dict_dt_pad_preserves_median():
    """Per-step dt tails pad with the dataset median (NOT 1.0): the
    survival tables derive dt_repr from the median of the padded array,
    so a constant fill silently rebuilt them for the wrong interval on
    ragged-length datasets."""
    tracks = {"3": np.random.default_rng(0).normal(0, 0.05, (40, 3, 2)),
              "20": np.random.default_rng(1).normal(0, 0.05, (1, 20, 2))}
    dts = {"3": np.full((40, 2), 0.02), "20": np.full((1, 19), 0.02)}
    b = tdata.from_dict(tracks, dt=dts)
    assert float(np.median(np.asarray(b.dt))) == pytest.approx(0.02)
    # padding the batch/time axes keeps the median (and the engine masked)
    p = b.pad_batch_to(64).pad_len_to(24)
    assert float(np.median(np.asarray(p.dt))) == pytest.approx(0.02)


def test_bucketing_handles_many_distinct_lengths():
    """The bucket-boundary DP must cover datasets with arbitrarily many
    distinct track lengths (a fixed look-back window used to KeyError
    beyond 32*max_buckets) and respect max_buckets exactly."""
    rng = np.random.default_rng(2)
    tracks = {str(l): rng.normal(0, 0.05, (2, l, 2)) for l in range(2, 131)}
    for mb in (1, 4):
        bs = tdata.from_dict_bucketed(tracks, max_buckets=mb)
        assert 1 <= len(bs) <= mb
        assert sum(x.batch_size for x in bs) == 2 * 129
        assert max(x.max_len for x in bs) == 130


def test_trace_signature_ignores_tied_values():
    """set_values(resolve()) — what fit does to returned params — must not
    change the trace signature: expr-tied params' stored values are never
    read, and a changed signature defeats the shared-jit cache."""
    spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.001, 0.05])
    other = spec.copy()
    other.set_values(other.resolve())
    assert spec.trace_signature() == other.trace_signature()


def test_get_params_without_d0():
    """estimated_vals lacking D0 must still register every provided D."""
    p = xp.get_params(nb_states=2, estimated_vals={
        "D1": 0.1, "F0": 0.5, "p01": 0.1, "p10": 0.1,
        "LocErr": 0.02, "pBL": 0.05})
    r = p.resolve()
    assert float(r["D0"]) == pytest.approx(0.0)
    assert float(r["D1"]) == pytest.approx(0.1)


def test_oracle_shared_per_frame_loc_err():
    """A shared (T, D) loc_err is per-frame, not per-track: the batch
    oracle must broadcast it over tracks instead of indexing the time
    axis with the track index."""
    rng = np.random.default_rng(3)
    xs = rng.normal(0, 0.05, (3, 5, 2))
    lengths = np.array([5, 5, 5])
    isbl = np.zeros(3)
    kw = dict(Ds=np.array([0.0, 0.08]), Fs=np.array([0.5, 0.5]),
              tr_sub=np.array([[0.9, 0.1], [0.1, 0.9]]), pBL=0.05,
              cell_dims=(0.5,), dt=0.02)
    t_scalar = oracle.batch_log_likelihood(xs, lengths, isbl, 0.02, **kw)
    t_frame = oracle.batch_log_likelihood(
        xs, lengths, isbl, np.full((5, 2), 0.02), **kw)
    t_track = oracle.batch_log_likelihood(
        xs, lengths, isbl, np.full((3, 5, 2), 0.02), **kw)
    assert t_frame == pytest.approx(t_scalar, abs=1e-9)
    assert t_track == pytest.approx(t_scalar, abs=1e-9)
