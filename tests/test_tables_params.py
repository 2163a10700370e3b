"""Model tables and parameter system unit tests."""
import numpy as np
import pytest
from scipy.linalg import expm

import jax
import jax.numpy as jnp

from extrack_tpu import params as xp
from extrack_tpu.core import tables


RATES = np.array([[0.0, 0.12, 0.03], [0.2, 0.0, 0.05], [0.02, 0.3, 0.0]])


def test_transition_matrix_types():
    # type 0: linear
    t0 = np.asarray(tables.transition_matrix(RATES, matrix_type=0))
    off = RATES * (1 - np.eye(3))
    assert np.allclose(t0 - np.diag(np.diag(t0)), off)
    np.testing.assert_allclose(t0.sum(1), 1.0)
    # type 1: 1-exp(-r) off-diagonals (extrack/tracking.py:956-958)
    t1 = np.asarray(tables.transition_matrix(RATES, matrix_type=1))
    np.testing.assert_allclose(t1[0, 1], 1 - np.exp(-0.12))
    np.testing.assert_allclose(t1.sum(1), 1.0)
    # type 2: matrix exponential of the generator
    t2 = np.asarray(tables.transition_matrix(RATES, matrix_type=2))
    gen = off - np.diag(off.sum(1))
    np.testing.assert_allclose(t2, expm(gen), rtol=1e-6)
    # types 3/4: blends of 0 and 2
    t3 = np.asarray(tables.transition_matrix(RATES, matrix_type=3))
    np.testing.assert_allclose(t3, 0.5 * (t0 + t2), rtol=1e-6)
    t4 = np.asarray(tables.transition_matrix(RATES, matrix_type=4))
    np.testing.assert_allclose(t4, np.sqrt(t0 * t2), rtol=1e-6)
    # substep division
    t1s = np.asarray(tables.transition_matrix(RATES, nb_substeps=2,
                                              matrix_type=1))
    np.testing.assert_allclose(t1s[0, 1], 1 - np.exp(-0.06))


def test_stationary_fractions_match_reference_formulas():
    # 2-state closed form (simulate_tracks.py:26-28)
    tr2 = np.array([[0.9, 0.1], [0.05, 0.95]])
    pi = tables.stationary_fractions(tr2)
    np.testing.assert_allclose(pi, [0.05 / 0.15, 0.1 / 0.15], rtol=1e-12)
    # general: pi @ T == pi
    tr3 = np.asarray(tables.transition_matrix(RATES, matrix_type=1))
    pi3 = tables.stationary_fractions(tr3)
    np.testing.assert_allclose(pi3 @ tr3, pi3, atol=1e-12)


def test_displacement_var_patterns():
    d2 = jnp.asarray([[1.0, 4.0]])
    out = np.asarray(tables.displacement_var(d2, nb_substeps=1))[0]
    # patterns newest-first: (0,0)=1, (0,1)=2.5, (1,0)=2.5, (1,1)=4
    np.testing.assert_allclose(out, [1.0, 2.5, 2.5, 4.0])
    out2 = np.asarray(tables.displacement_var(d2, nb_substeps=2))[0]
    # pattern (a0,a1,prev)=(0,1,1): (0.5*1 + 1*4 + 0.5*4)/2 = 3.25
    np.testing.assert_allclose(out2[0b011], 3.25)


def test_bijection_roundtrip():
    spec = xp.generate_params(nb_states=3, LocErr_type=1, D_max=2.0)
    z = spec.to_unconstrained()
    vals = spec.resolve(spec.from_unconstrained(jnp.asarray(z)))
    for name in spec.free_names():
        assert float(np.asarray(vals[name])) == pytest.approx(
            spec[name].value, rel=1e-8, abs=1e-9)
    # bounds are respected at extreme z
    vals_lo = spec.from_unconstrained(jnp.full(len(z), -50.0))
    for name, v in vals_lo.items():
        p = spec[name]
        assert p.min - 1e-9 <= float(np.asarray(v)) <= p.max + 1e-9


def test_expr_graph_and_get_params():
    spec = xp.get_params(
        nb_states=2, steady_state=False,
        estimated_vals={"LocErr": 0.025, "D0": 1e-20, "D1": 0.05,
                        "F0": 0.45, "p01": 0.05, "p10": 0.05, "pBL": 0.1},
        min_values={"LocErr": 0.007, "D0": 1e-12, "D1": 1e-5, "F0": 0.001,
                    "p01": 0.01, "p10": 0.01, "pBL": 0.01},
        max_values={"LocErr": 0.6, "D0": 1, "D1": 10, "F0": 0.999,
                    "p01": 1.0, "p10": 1.0, "pBL": 0.99})
    vals = spec.resolve()
    assert float(np.asarray(vals["F1"])) == pytest.approx(0.55)
    assert float(np.asarray(vals["D1"])) == pytest.approx(0.05, rel=1e-6)
    # chained dependency resolves regardless of insertion order
    p = xp.Parameters()
    p.add("c", expr="b * 2")
    p.add("b", expr="a + 1")
    p.add("a", 3.0)
    assert float(np.asarray(p.resolve()["c"])) == 8.0


def test_fisher_errors_match_numerical_hessian():
    # quadratic objective: -logL = 0.5*((a-1)^2/0.04 + (b-2)^2/0.09)
    spec = xp.Parameters()
    spec.add("a", 1.0, 0.0, 10.0)
    spec.add("b", 2.0, 0.0, 10.0)

    def neg_logl(z):
        vals = spec.from_unconstrained(z)
        return (0.5 * (vals["a"] - 1.0) ** 2 / 0.04
                + 0.5 * (vals["b"] - 2.0) ** 2 / 0.09)

    from extrack_tpu.fit import fisher_errors
    errs = fisher_errors(neg_logl, spec, jnp.asarray(
        spec.to_unconstrained()))
    assert errs["a"] == pytest.approx(0.2, rel=1e-4)
    assert errs["b"] == pytest.approx(0.3, rel=1e-4)


def test_auto_fit_heuristics():
    from extrack_tpu import auto_fitting
    h = auto_fitting.choose_hyperparams(
        {"LocErr": 0.02, "D0": 0.0, "D1": 0.5, "p01": 0.05, "p10": 0.05,
         "pBL": 0.1}, dt=0.02, nb_states=2)
    assert h["frame_len"] == 4          # high DLR -> short window
    h2 = auto_fitting.choose_hyperparams(
        {"LocErr": 0.05, "D0": 0.0, "D1": 0.005, "p01": 0.4, "p10": 0.05,
         "pBL": 0.1}, dt=0.02, nb_states=2)
    assert h2["frame_len"] == 7         # low DLR -> long window
    assert h2["nb_substeps"] == 2       # fast transitions -> substeps


def test_steady_state_four_states():
    """>=4-state fractions = stationary distribution (differentiable)."""
    import jax
    import jax.numpy as jnp
    from extrack_tpu import params as tparams

    n = 4
    rng = np.random.default_rng(0)
    rates = rng.uniform(0.02, 0.3, (n, n))
    p = tparams.Parameters()
    for i in range(n):
        for j in range(n):
            if i != j:
                p.add(f"p{i}{j}", rates[i, j], 1e-4, 1.0)
    tparams.apply_steady_state(p, n)
    vals = p.resolve()
    pi = np.array([float(vals[f"F{s}"]) for s in range(n)])
    # stationary of the generator: pi^T Q = 0
    Q = rates.copy()
    np.fill_diagonal(Q, 0.0)
    np.fill_diagonal(Q, -Q.sum(1))
    np.testing.assert_allclose(pi @ Q, 0.0, atol=1e-12)
    np.testing.assert_allclose(pi.sum(), 1.0, rtol=1e-12)
    # matches the hand-written 3-state exprs on a 3-state system
    p3a = tparams.Parameters()
    p3b = tparams.Parameters()
    for i in range(3):
        for j in range(3):
            if i != j:
                p3a.add(f"p{i}{j}", rates[i, j], 1e-4, 1.0)
                p3b.add(f"p{i}{j}", rates[i, j], 1e-4, 1.0)
    tparams.apply_steady_state(p3a, 3)          # hand exprs
    p3b.steady_state_n = 3                       # general solve
    for s in range(3):
        p3b.add(f"F{s}", 0.3, expr="__steady_state__")
    va, vb = p3a.resolve(), p3b.resolve()
    for s in range(3):
        np.testing.assert_allclose(float(vb[f"F{s}"]), float(va[f"F{s}"]),
                                   rtol=1e-12)
    # differentiable: grad of F0 w.r.t. a free rate is finite and nonzero
    def f0(r01):
        return p.resolve({"p01": r01})["F0"]
    g = jax.grad(f0)(jnp.asarray(rates[0, 1]))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_generate_params_four_state_steady():
    from extrack_tpu import params as tparams
    p = tparams.generate_params(nb_states=4, D_max=1.0, steady_state=True)
    vals = p.resolve()
    pi = np.array([float(vals[f"F{s}"]) for s in range(4)])
    np.testing.assert_allclose(pi.sum(), 1.0, rtol=1e-12)
    assert all(not p[f"F{s}"].vary for s in range(4))


def test_steady_state_with_expr_tied_rate():
    """Rates may be expr-tied; the stationary solve must see them resolved
    (review fix: resolve() drained the expr graph only after the solve)."""
    import jax.numpy as jnp
    from extrack_tpu import params as tparams
    p = tparams.Parameters()
    p.add("p01", 0.08, min=0.0, max=1.0)
    p.add("p10", None, expr="p01 * 2")
    p.steady_state_n = 2
    for s in range(2):
        p.add(f"F{s}", 0.5, vary=False)
    vals = p.resolve()
    np.testing.assert_allclose(float(vals["p10"]), 0.16, rtol=1e-12)
    # pi for rates (0.08, 0.16): pi0 = p10/(p01+p10) = 2/3
    np.testing.assert_allclose(float(vals["F0"]), 2.0 / 3.0, rtol=1e-10)
    np.testing.assert_allclose(float(vals["F0"]) + float(vals["F1"]), 1.0,
                               rtol=1e-12)
