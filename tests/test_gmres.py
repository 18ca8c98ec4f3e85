"""FGMRES and PCG: convergence on dense reference problems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.solvers import cg, gmres


def _random_system(n, seed=0, spd=False):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n)) / np.sqrt(n)
    if spd:
        A = A @ A.T + n * np.eye(n)
    else:
        A = A + 3.0 * np.eye(n)  # well conditioned, nonsymmetric
    b = rng.normal(size=n)
    return jnp.asarray(A), jnp.asarray(b)


def test_fgmres_full_rank_exact():
    A, b = _random_system(50)
    res = gmres.fgmres(lambda v: A @ v, b, restart=60, maxiter=60, rtol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(A @ res.x, b, atol=1e-7)


def test_fgmres_restarted():
    A, b = _random_system(80, seed=1)
    res = gmres.fgmres(lambda v: A @ v, b, restart=15, maxiter=400, rtol=1e-8)
    assert bool(res.converged)
    assert np.linalg.norm(A @ res.x - b) <= 1e-7 * np.linalg.norm(b)


def test_fgmres_exact_preconditioner_one_iter():
    A, b = _random_system(40, seed=2)
    Ainv = jnp.linalg.inv(A)
    res = gmres.fgmres(lambda v: A @ v, b, precond=lambda v: Ainv @ v, restart=10, maxiter=10, rtol=1e-8)
    assert bool(res.converged)
    assert int(res.iterations) <= 2


def test_fgmres_flexible_inner_cg():
    """Inner nonstationary solver (CG) as preconditioner — FGMRES handles it."""
    A, b = _random_system(60, seed=3, spd=True)
    diag = jnp.diag(A)

    def precond(r):
        return cg.pcg(lambda v: A @ v, r, diag, iters=5)

    res = gmres.fgmres(lambda v: A @ v, b, precond=precond, restart=30, maxiter=60, rtol=1e-9)
    assert bool(res.converged)
    np.testing.assert_allclose(A @ res.x, b, atol=1e-6)


def test_fgmres_warm_start():
    A, b = _random_system(30, seed=4)
    x_exact = jnp.linalg.solve(A, b)
    res = gmres.fgmres(lambda v: A @ v, b, x0=x_exact, restart=10, maxiter=10, rtol=1e-6)
    assert bool(res.converged)
    assert int(res.iterations) <= 1


def test_fgmres_nonconvergence_flag():
    A, b = _random_system(60, seed=5)
    res = gmres.fgmres(lambda v: A @ v, b, restart=3, maxiter=3, rtol=1e-14)
    assert not bool(res.converged)
    # Best iterate is still returned (reference keeps it too: cpp:852-860).
    assert np.linalg.norm(A @ res.x - b) < np.linalg.norm(b)


def test_fgmres_zero_rhs():
    A, _ = _random_system(10, seed=6)
    res = gmres.fgmres(lambda v: A @ v, jnp.zeros(10), restart=5, maxiter=5)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, 0.0)


def test_fgmres_jits():
    A, b = _random_system(40, seed=7)

    @jax.jit
    def solve(b):
        return gmres.fgmres(lambda v: A @ v, b, restart=20, maxiter=100, rtol=1e-9)

    res = solve(b)
    assert bool(res.converged)
    np.testing.assert_allclose(A @ res.x, b, atol=1e-6)


def test_pcg_spd():
    A, b = _random_system(50, seed=8, spd=True)
    x = cg.pcg(lambda v: A @ v, b, jnp.diag(A), iters=60)
    np.testing.assert_allclose(A @ x, b, rtol=1e-8, atol=1e-8)


def test_fgmres_defect_criterion_vs_rhs_on_warm_start():
    """With a warm start already under rtol*||b||, the 'rhs' criterion
    accepts at 0 iterations; 'defect' demands a genuine reduction of the
    remaining defect (the mesh-3D-xfine freeze mechanism, docs/DESIGN.md)."""
    A, b = _random_system(60, seed=9)
    exact = jnp.linalg.solve(A, b)
    x0 = exact + 1e-5 * jnp.linalg.norm(exact) * jnp.ones_like(exact) / jnp.sqrt(60.0)

    res_rhs = gmres.fgmres(lambda v: A @ v, b, x0=x0, restart=30, maxiter=60,
                           rtol=1e-2)
    assert bool(res_rhs.converged) and int(res_rhs.iterations) == 0

    res_def = gmres.fgmres(lambda v: A @ v, b, x0=x0, restart=30, maxiter=60,
                           rtol=1e-2, criterion="defect")
    assert bool(res_def.converged) and int(res_def.iterations) > 0
    r0 = float(jnp.linalg.norm(b - A @ x0))
    r_end = float(jnp.linalg.norm(b - A @ res_def.x))
    # Stopping level: max(rtol * r0, the 1e-6*||b|| floor), plus slack for
    # the Givens estimate vs the true residual.
    bn = float(jnp.linalg.norm(b))
    assert r_end <= 1.5 * max(1e-2 * r0, 1e-6 * bn)


def test_fgmres_chunked_dots_matches_plain():
    """dots='chunked' (two-level accumulation) solves the same system.

    In f64 the roundoff difference is negligible, so the chunked and plain
    trajectories must agree to solver tolerance; n is chosen to exercise
    the pad-to-chunk path (n % 8192 != 0).
    """
    A, b = _random_system(257, seed=5)
    plain = gmres.fgmres(lambda v: A @ v, b, restart=80, maxiter=300, rtol=1e-9)
    chunk = gmres.fgmres(
        lambda v: A @ v, b, restart=80, maxiter=300, rtol=1e-9, dots="chunked"
    )
    assert bool(chunk.converged)
    assert abs(int(chunk.iterations) - int(plain.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(chunk.x), np.asarray(plain.x), atol=1e-7)


def test_fgmres_chunked_dots_with_weight():
    """Chunked accumulation composes with the owner-mask weight."""
    A, b = _random_system(100, seed=6)
    wt = jnp.ones_like(b)
    res = gmres.fgmres(
        lambda v: A @ v, b, restart=60, maxiter=120, rtol=1e-9,
        weight=wt, dots="chunked",
    )
    assert bool(res.converged)
    assert np.linalg.norm(np.asarray(A @ res.x - b)) <= 1e-7 * np.linalg.norm(b)
