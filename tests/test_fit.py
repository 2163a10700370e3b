"""Simulate -> fit parameter-recovery integration tests.

This is the reference's only correctness check (its tutorial simulates with
known D/TrMat and refits, SURVEY.md section 4); here it runs as an automated
test with fixed seeds.
"""
import numpy as np
import pytest

from extrack_tpu import data as tdata
from extrack_tpu import fit, params as xp, simulate


@pytest.fixture(scope="module")
def sim_dataset():
    tracks, states, sigs = simulate.sim_fov(
        nb_tracks=1500, max_track_len=12, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, 0.1], [0.1, 0.9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=7)
    return tracks, states, sigs


def test_two_state_parameter_recovery(sim_dataset):
    tracks, _, _ = sim_dataset
    batch = tdata.from_dict(tracks)
    spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.005, 0.05],
                              estimated_transition_rates=0.08)
    res = fit.fit(batch, spec, 0.02, 2, cell_dims=(0.5,), window=4,
                  verbose=0, compute_errors=True)
    assert res.success
    v = res.params.valuesdict()
    assert v["LocErr"] == pytest.approx(0.02, rel=0.1)
    assert v["D0"] == pytest.approx(0.0, abs=0.004)
    assert v["D1"] == pytest.approx(0.08, rel=0.25)
    assert v["p01"] == pytest.approx(0.1, rel=0.5)
    assert v["p10"] == pytest.approx(0.1, rel=0.5)
    assert v["pBL"] == pytest.approx(0.05, rel=0.5)
    # Fisher errors exist and are sane
    assert 0 < res.std_errors["LocErr"] < 0.01


def test_fit_improves_logl(sim_dataset):
    tracks, _, _ = sim_dataset
    batch = tdata.from_dict(tracks)
    spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.005, 0.05],
                              estimated_transition_rates=0.08)
    obj = fit.make_objective(batch, spec, 0.02, 2, cell_dims=(0.5,), window=4)
    init = -float(obj(spec.to_unconstrained()))
    res = fit.fit(batch, spec, 0.02, 2, cell_dims=(0.5,), window=4, verbose=0)
    assert res.logl > init


def test_steady_state_constraint():
    spec = xp.generate_params(nb_states=2, steady_state=True)
    vals = spec.resolve()
    f0, p01, p10 = (float(np.asarray(vals[k])) for k in ("F0", "p01", "p10"))
    assert p10 == pytest.approx(p01 / (1 / f0 - 1))
    assert "p10" not in spec.free_names()


def test_predict_annotates_states(sim_dataset):
    from extrack_tpu import predict
    tracks, states, _ = sim_dataset
    spec = xp.generate_params(nb_states=2, LocErr_type=1,
                              estimated_LocErr=[0.02],
                              estimated_Ds=[0.0, 0.08],
                              estimated_Fs=[0.5, 0.5],
                              estimated_transition_rates=0.1)
    preds = predict.predict_Bs(tracks, 0.02, spec, cell_dims=(0.5,),
                               nb_states=2, frame_len=5)
    # posterior argmax should agree with the true states most of the time
    correct = total = 0
    for key in preds:
        guess = np.argmax(preds[key], axis=-1)
        correct += (guess == states[key]).sum()
        total += guess.size
    assert total > 0
    assert correct / total > 0.8
    # rows are normalized
    for key in preds:
        np.testing.assert_allclose(preds[key].sum(-1), 1.0, atol=1e-8)


def test_device_lbfgs_matches_scipy():
    """The one-dispatch on-device L-BFGS (lax.while_loop + zoom linesearch)
    reaches the same optimum as the scipy host driver."""
    import numpy as np
    from extrack_tpu import fit, simulate
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=300, max_track_len=9, min_track_len=4, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, .1], [.1, .9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=9)
    r1 = fit.param_fitting(tracks, 0.02, nb_states=2, frame_len=4,
                           cell_dims=(0.5,), verbose=0)
    r2 = fit.param_fitting(tracks, 0.02, nb_states=2, frame_len=4,
                           cell_dims=(0.5,), verbose=0,
                           method="device-lbfgs")
    assert r1.success          # the scipy baseline converged
    assert r2.success and r2.n_evals > 0
    assert abs(r1.logl - r2.logl) <= 1e-3 * abs(r1.logl) + 0.5
    assert abs(r1.params["D1"].value - r2.params["D1"].value) < 5e-3


def test_trace_signature_sharing():
    """Objectives with identical configuration share jitted artifacts
    (fit._shared_jit); any baked constant differing must change the key."""
    import numpy as np
    from extrack_tpu import data as tdata, fit, params as xp, simulate
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=60, max_track_len=8, min_track_len=4, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, .1], [.1, .9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=11)
    batch = tdata.from_dict(tracks)

    def obj(spec, **kw):
        return fit.make_objective(batch, spec, kw.pop("dt", 0.02), 2,
                                  (0.5,), 1, 4, None, 1, False, False,
                                  "auto", **kw)

    spec = xp.generate_params(nb_states=2, D_max=1.0)
    a = obj(spec)
    b = obj(xp.generate_params(nb_states=2, D_max=1.0))
    assert a.trace_signature == b.trace_signature
    # bounds are baked into the bijections -> must not share
    c = obj(xp.generate_params(nb_states=2, D_max=3.0))
    assert a.trace_signature != c.trace_signature
    # the scalar dt is baked as a constant -> must not share
    d = obj(xp.generate_params(nb_states=2, D_max=1.0), dt=0.04)
    assert a.trace_signature != d.trace_signature
    # fixed-parameter VALUES are baked; free values ride in z
    s2 = xp.generate_params(nb_states=2, D_max=1.0)
    s2["pBL"].vary = False
    assert obj(s2).trace_signature != a.trace_signature

    # behavioral: a second identical fit reuses the cached vg and returns
    # the same optimum
    fit._JIT_CACHE.clear()
    r1 = fit.fit(batch, spec, 0.02, 2, cell_dims=(0.5,), window=4, verbose=0)
    n_cached = len(fit._JIT_CACHE)
    assert n_cached >= 1
    r2 = fit.fit(batch, xp.generate_params(nb_states=2, D_max=1.0), 0.02, 2,
                 cell_dims=(0.5,), window=4, verbose=0)
    assert len(fit._JIT_CACHE) == n_cached       # no new artifacts built
    assert abs(r1.logl - r2.logl) < 1e-6 * abs(r1.logl) + 1e-6


def test_objective_core_is_dataset_free():
    """Regression for two review findings: (a) jitted artifacts cached
    across objectives (_shared_jit/_JIT_CACHE) are built from
    neg_logl.core, which must not close over the track batches or they
    are retained for the process lifetime; (b) has_len2 must be decided
    at build time from np_lengths (the host cache does not survive
    jax.device_put), not read off the runtime data."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    tracks = {"5": rng.normal(0, 0.1, (6, 5, 2)).cumsum(1)}
    batch = tdata.from_dict(tracks)
    spec = xp.generate_params(nb_states=2, D_max=1.0)
    obj = fit.make_objective(batch, spec, 0.02, 2, cell_dims=(1.0,),
                             window=4)
    assert "batches" not in obj.core.__code__.co_freevars
    # no 2-frame tracks -> the static closing removal must engage
    assert obj.trace_signature[-1] == (False,)
    # and the argument path must agree with the closed-over path
    z = jnp.asarray(spec.to_unconstrained())
    data = jax.device_put(obj.batches)
    np.testing.assert_allclose(float(obj(z)), float(obj.core(z, data)),
                               rtol=1e-12)


def test_objective_rejects_negative_derived_fraction():
    """F_last = 1 - sum(F_i) can go negative at >= 3 states (each free F is
    bounded, their sum is not).  Regression: build_tables' finite log floor
    silently kept such priors UNNORMALIZED (inflating logL by B*log(sum F),
    enough to flip a BIC model selection); the objective must reject the
    region like the reference's validity guard (tracking.py:1017)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(12)
    tracks = {"6": rng.normal(0, 0.1, (20, 6, 2)).cumsum(1)}
    batch = tdata.from_dict(tracks)
    spec = xp.generate_params(nb_states=3, D_max=1.0)
    spec["F0"].value = 0.99
    spec["F1"].value = 0.99          # -> resolved F2 = -0.98
    assert spec.resolve()["F2"] < 0
    neg_logl = fit.make_objective(batch, spec, 0.02, 3, window=4)
    bad = float(neg_logl(jnp.asarray(spec.to_unconstrained())))
    assert not np.isfinite(bad) or bad >= 1e290
    # a valid point stays finite
    spec["F0"].value = 0.4
    spec["F1"].value = 0.3           # -> resolved F2 = 0.3
    good = float(neg_logl(jnp.asarray(spec.to_unconstrained())))
    assert np.isfinite(good)

    # the reference-named objective guards identically (host-side)
    from extrack_tpu import tracking
    spec["F0"].value = 0.99
    spec["F1"].value = 0.99
    out = tracking.cum_Proba_Cs(spec, tracks, 0.02, (1.0,), None, 3, 1, 4,
                                verbose=0)
    assert out == float("inf")


def test_fit_passes_flags_to_objective_by_keyword(sim_dataset,
                                                  monkeypatch):
    """Regression: make_objective grew ``pallas_block`` BEFORE ``sharded``
    (round 4) while fit() still passed (input_loc_err, sharded,
    compute_engine) positionally — compute_engine="auto" (truthy!) landed
    in ``sharded``, so every fit() ran the shard_map path on a 1-device
    mesh and the exact-HVP Fisher path always refused (it requires
    unsharded objectives)."""
    tracks, _, _ = sim_dataset
    batch = tdata.from_dict(tracks)
    spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.005, 0.05],
                              estimated_transition_rates=0.08)
    seen = {}
    real = fit.make_objective

    def spy(*args, **kwargs):
        obj = real(*args, **kwargs)
        seen["is_sharded"] = obj.is_sharded
        seen["sig"] = obj.trace_signature
        return obj

    monkeypatch.setattr(fit, "make_objective", spy)
    fit.fit(batch, spec, 0.02, 2, cell_dims=(0.5,), window=4, verbose=0,
            max_iter=1)
    assert seen["is_sharded"] is False
    # trace signature records (sharded, mesh size): must say unsharded
    assert seen["sig"][-5] is False and seen["sig"][-4] is None
