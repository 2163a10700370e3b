"""Unit tests of the Gaussian-product primitives against numerical quadrature."""
import numpy as np
import pytest
from scipy import integrate
from scipy.stats import norm

from extrack_tpu.core import gaussian


def _pdf(x, mu, sig):
    return norm.pdf(x, loc=mu, scale=sig)


def test_propagate_matches_quadrature():
    rng = np.random.default_rng(0)
    x, m = rng.normal(size=2)
    l2, sig2, s2 = 0.03, 0.08, 0.05

    def integrand(r1, r0):
        return (_pdf(x, r1, np.sqrt(l2)) * _pdf(r0 - r1, 0, np.sqrt(sig2))
                * _pdf(r1, m, np.sqrt(s2)))

    new_m, new_s2, log_c = gaussian.propagate(
        np.array([x]), np.array([l2]), np.array([sig2]),
        np.array([m]), np.array([s2]))
    for r0 in [-0.7, 0.1, 1.3]:
        num, _ = integrate.quad(integrand, -6, 6, args=(r0,), limit=400,
                                points=(float(new_m[0]), m, x))
        ana = np.exp(log_c) * _pdf(r0, new_m[0], np.sqrt(new_s2[0]))
        assert num == pytest.approx(float(ana), rel=1e-9)


def test_first_convolve():
    m, s2 = gaussian.first_convolve(np.array([1.5]), np.array([0.02]),
                                    np.array([0.1]))
    assert m[0] == 1.5 and s2[0] == pytest.approx(0.12)


def test_product_2_matches_pointwise():
    rng = np.random.default_rng(1)
    mu1, mu2 = rng.normal(size=(2, 3))
    s1, s2 = 0.2, 0.5
    sig, mu, log_c = gaussian.product_2(np.full(3, s1), np.full(3, s2),
                                        mu1, mu2)
    for x in [-0.3, 0.4]:
        lhs = np.prod(_pdf(x, mu1, s1) * _pdf(x, mu2, s2))
        rhs = np.exp(log_c) * np.prod(_pdf(x, mu, sig))
        assert lhs == pytest.approx(float(rhs), rel=1e-9)


def test_product_3_matches_pointwise():
    rng = np.random.default_rng(2)
    mu = rng.normal(size=(3, 2))
    sigs = [0.2, 0.4, 0.3]
    sig, m, log_c = gaussian.product_3(
        np.full(2, sigs[0]), np.full(2, sigs[1]), np.full(2, sigs[2]),
        mu[0], mu[1], mu[2])
    for x in [-0.5, 0.25]:
        lhs = np.prod([_pdf(x, mu[i], sigs[i]) for i in range(3)])
        rhs = np.exp(log_c) * np.prod(_pdf(x, m, sig))
        assert lhs == pytest.approx(float(rhs), rel=1e-9)
