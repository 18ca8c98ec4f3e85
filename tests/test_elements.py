"""Reference elements: Kronecker property, partition of unity, derivatives."""

import numpy as np
import pytest

from navier_stokes_equations_tpu.ops import elements as el
from navier_stokes_equations_tpu.ops import quadrature as quad


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_kronecker_at_nodes(dim, degree):
    nodes = el.reference_nodes(dim, degree)
    t = el.shape_tables(dim, degree, nodes)
    np.testing.assert_allclose(t.values, np.eye(len(nodes)), atol=1e-13)


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_partition_of_unity(dim, degree):
    rule = quad.simplex_rule(dim, 3)
    t = el.shape_tables(dim, degree, rule.points)
    np.testing.assert_allclose(t.values.sum(axis=1), 1.0, atol=1e-13)
    np.testing.assert_allclose(t.grads.sum(axis=1), 0.0, atol=1e-13)
    np.testing.assert_allclose(t.hessians.sum(axis=1), 0.0, atol=1e-13)


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_gradients_finite_difference(dim, degree):
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.25, size=(5, dim))
    t = el.shape_tables(dim, degree, pts)
    eps = 1e-6
    for d in range(dim):
        dp = pts.copy()
        dp[:, d] += eps
        dm = pts.copy()
        dm[:, d] -= eps
        fd = (el.shape_tables(dim, degree, dp).values - el.shape_tables(dim, degree, dm).values) / (2 * eps)
        np.testing.assert_allclose(t.grads[:, :, d], fd, atol=1e-8)


@pytest.mark.parametrize("dim", [2, 3])
def test_hessians_finite_difference(dim):
    rng = np.random.default_rng(1)
    pts = rng.uniform(0.05, 0.2, size=(3, dim))
    t = el.shape_tables(dim, 2, pts)
    eps = 1e-5
    for d1 in range(dim):
        for d2 in range(dim):
            pp = pts.copy(); pp[:, d1] += eps; pp[:, d2] += eps
            pm = pts.copy(); pm[:, d1] += eps; pm[:, d2] -= eps
            mp = pts.copy(); mp[:, d1] -= eps; mp[:, d2] += eps
            mm = pts.copy(); mm[:, d1] -= eps; mm[:, d2] -= eps
            fd = (
                el.shape_tables(dim, 2, pp).values
                - el.shape_tables(dim, 2, pm).values
                - el.shape_tables(dim, 2, mp).values
                + el.shape_tables(dim, 2, mm).values
            ) / (4 * eps * eps)
            np.testing.assert_allclose(t.hessians[:, :, d1, d2], fd, atol=1e-4)


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_reproduces_quadratics(dim):
    """P2 interpolation is exact for quadratic fields (incl. at face points)."""
    rng = np.random.default_rng(2)
    A = rng.normal(size=(dim, dim))
    A = A + A.T
    b = rng.normal(size=dim)
    c = 0.7

    def f(x):
        return np.einsum("...i,ij,...j->...", x, A, x) + x @ b + c

    nodes = el.reference_nodes(dim, 2)
    coeffs = f(nodes)
    rule = quad.simplex_rule(dim, 3)
    t = el.shape_tables(dim, 2, rule.points)
    np.testing.assert_allclose(t.values @ coeffs, f(rule.points), atol=1e-12)
    # Gradient exactness: grad f = 2 A x + b.
    want = 2 * rule.points @ A + b
    np.testing.assert_allclose(np.einsum("qn,qnd->qd", np.tile(coeffs, (len(rule.points), 1)) * 0 + coeffs, t.grads), want, atol=1e-12)


def test_face_points_map():
    pts = np.array([[0.25], [0.5]])
    mapped = el.face_points_to_cell(2, (1, 2), pts)
    # Face (1,2) of ref triangle connects (1,0) and (0,1).
    np.testing.assert_allclose(mapped[0], [0.75, 0.25], atol=1e-14)
    np.testing.assert_allclose(mapped[1], [0.5, 0.5], atol=1e-14)


def test_radon7_degree5_exactness():
    """Compact 7-point triangle rule integrates all monomials of degree <=5."""
    from math import factorial

    r = quad.triangle_rule_radon7()
    assert r.num_points == 7
    for a in range(6):
        for b in range(6 - a):
            exact = factorial(a) * factorial(b) / factorial(a + b + 2)
            got = float((r.weights * r.points[:, 0] ** a * r.points[:, 1] ** b).sum())
            assert abs(got - exact) < 1e-14, (a, b)


def test_tet15_degree5_exactness():
    """Compact 15-point tet rule integrates all monomials of degree <=5."""
    from math import factorial

    r = quad.tetrahedron_rule_15pt()
    assert r.num_points == 15
    assert (r.weights > 0).all()
    for i in range(6):
        for j in range(6 - i):
            for k in range(6 - i - j):
                exact = factorial(i) * factorial(j) * factorial(k) / factorial(i + j + k + 3)
                got = float(
                    (r.weights * r.points[:, 0] ** i * r.points[:, 1] ** j * r.points[:, 2] ** k).sum()
                )
                assert abs(got - exact) < 1e-14, (i, j, k)
