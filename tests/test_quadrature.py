"""Quadrature rules: exactness on monomials vs analytic simplex integrals."""

import math

import numpy as np
import pytest

from navier_stokes_equations_tpu.ops import quadrature as quad


def _simplex_monomial_integral(exponents):
    """int_simplex prod x_i^{a_i} dx = prod(a_i!) / (sum(a_i) + d)!"""
    d = len(exponents)
    num = 1.0
    for a in exponents:
        num *= math.factorial(a)
    return num / math.factorial(sum(exponents) + d)


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_segment_exactness(n):
    rule = quad.segment_rule(n)
    for deg in range(2 * n):
        got = np.sum(rule.weights * rule.points[:, 0] ** deg)
        assert got == pytest.approx(1.0 / (deg + 1), rel=1e-12)


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_triangle_exactness(n):
    rule = quad.triangle_rule(n)
    assert rule.weights.sum() == pytest.approx(0.5, rel=1e-13)
    for ax in range(2 * n):
        for ay in range(2 * n - ax):
            got = np.sum(rule.weights * rule.points[:, 0] ** ax * rule.points[:, 1] ** ay)
            want = _simplex_monomial_integral((ax, ay))
            assert got == pytest.approx(want, rel=1e-11), (ax, ay)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_tetrahedron_exactness(n):
    rule = quad.tetrahedron_rule(n)
    assert rule.weights.sum() == pytest.approx(1.0 / 6.0, rel=1e-13)
    for ax in range(2 * n):
        for ay in range(2 * n - ax):
            for az in range(2 * n - ax - ay):
                got = np.sum(
                    rule.weights
                    * rule.points[:, 0] ** ax
                    * rule.points[:, 1] ** ay
                    * rule.points[:, 2] ** az
                )
                want = _simplex_monomial_integral((ax, ay, az))
                assert got == pytest.approx(want, rel=1e-10), (ax, ay, az)


def test_points_inside_simplex():
    for dim, maker in [(2, quad.triangle_rule), (3, quad.tetrahedron_rule)]:
        rule = maker(3)
        assert (rule.points >= 0).all()
        assert (rule.points.sum(axis=1) <= 1 + 1e-14).all()
        assert (rule.weights > 0).all()
