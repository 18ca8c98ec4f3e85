"""P1-coarse (p-multigrid) velocity preconditioner: transfers + end-to-end.

The coarse space is the P1 vertex subspace of the P2 velocity field on the
same mesh (solvers/preconditioners.py).  A preconditioner change must not
change the converged physics — only the Krylov iteration count.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.ops import dirichlet, fe_arrays
from navier_stokes_equations_tpu.solvers import preconditioners as pc


@pytest.fixture(scope="module")
def setup(mesh2d_path):
    mesh = taylor_hood.load(mesh2d_path)
    fe = fe_arrays.build_fe_arrays(mesh, dtype=jnp.float64)
    diri = dirichlet.build_dirichlet(mesh, fe, dtype=jnp.float64)
    pin = dirichlet.pressure_pin_mask(mesh, fe)
    pops = pc.build_pressure_operators(
        fe, pin, mesh=mesh, vel_mask=diri.mask, p1_coarse=True
    )
    return mesh, fe, diri, pops


def test_edge_verts_are_endpoints(setup):
    mesh, fe, _, pops = setup
    ev = np.asarray(pops.vc_edge_verts)
    coords = np.asarray(mesh.vel_coords)
    mids = 0.5 * (coords[ev[:, 0]] + coords[ev[:, 1]])
    np.testing.assert_allclose(coords[fe.n_p :], mids, atol=1e-12)


def test_restrict_is_prolong_transpose(setup):
    _, fe, _, pops = setup
    rng = np.random.default_rng(3)
    z1 = jnp.asarray(rng.standard_normal((fe.n_p, fe.dim)))
    r2 = jnp.asarray(rng.standard_normal((fe.n_vnodes, fe.dim)))
    lhs = float(jnp.vdot(pc.p1_prolong(pops, z1), r2))
    rhs = float(jnp.vdot(z1, pc.p1_restrict(pops, r2)))
    assert abs(lhs - rhs) < 1e-10 * (abs(lhs) + 1.0)


def test_coarse_solve_reduces_residual(setup):
    _, fe, _, pops = setup
    rng = np.random.default_rng(5)
    r1 = jnp.asarray(rng.standard_normal((fe.n_p, fe.dim)))
    r1 = jnp.where(pops.vc_mask1, 0.0, r1)
    c_dt, c_nu = 10.0, 0.001
    solve = pc.make_p1_coarse_solve(fe, pops, c_dt, c_nu, iters=30)
    z1 = solve(r1)
    # Recompute A1 z1 and compare against r1 on the free dofs.
    A1_e = c_dt * fe.mp_e + c_nu * fe.kp_e
    z_e = jnp.where(pops.vc_mask1, 0.0, z1)[fe.elems_p1]
    y = fe.accumulate_p_rows(jnp.einsum("ecf,efd->ecd", A1_e, z_e))
    resid = jnp.where(pops.vc_mask1, 0.0, r1 - y)
    assert float(jnp.linalg.norm(resid)) < 1e-3 * float(jnp.linalg.norm(r1))


@pytest.mark.parametrize("method", ["p1coarse", "p1coarse_mult"])
def test_e2e_matches_jacobi_trajectory(mesh2d_path, method):
    """Same physics as the Jacobi-preconditioned solver, to solve tolerance."""
    cfg0 = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01), dtype="float64",
        precond_vel_method="jacobi",
    )
    cfg1 = dataclasses.replace(cfg0, precond_vel_method=method, precond_p1_iters=8)
    s0 = solver.NavierStokesSolver(cfg0, mesh2d_path)
    s1 = solver.NavierStokesSolver(cfg1, mesh2d_path)
    st0, st1 = s0.initial_state(), s1.initial_state()
    for _ in range(3):
        st0, m0 = s0.step(st0)
        st1, m1 = s1.step(st1)
        assert bool(m1.converged)
        scale = float(jnp.max(jnp.abs(st0.x_old))) + 1e-30
        assert float(jnp.max(jnp.abs(st1.x_old - st0.x_old))) < 5e-3 * scale
        assert abs(float(m1.drag) - float(m0.drag)) < 1e-3
    # The coarse correction must not need MORE iterations than plain Jacobi.
    assert int(m1.gmres_iters) <= int(m0.gmres_iters) + 2


def test_halo_p1coarse_matches_single_device(mesh2d_path):
    """Halo-layout p1coarse (replicated coarse solve) == single-device."""
    import jax

    from navier_stokes_equations_tpu.parallel import halo_solver

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices (run under the CPU mesh conftest)")
    cfg = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01),
        dtype="float64", precond_vel_method="p1coarse", precond_p1_iters=6,
    )
    ref = solver.NavierStokesSolver(cfg, mesh2d_path)
    hs = halo_solver.HaloNavierStokesSolver(cfg, mesh2d_path, n_shards=8)
    s_ref, s_h = ref.initial_state(), hs.initial_state()
    for _ in range(2):
        s_ref, m_ref = ref.step(s_ref)
        s_h, m_h = hs.step(s_h)
        assert abs(int(m_h.gmres_iters) - int(m_ref.gmres_iters)) <= 2
        x_h = np.asarray(hs.global_solution(s_h))
        x_r = np.asarray(s_ref.x_old)
        scale = np.max(np.abs(x_r))
        assert np.max(np.abs(x_h - x_r)) < 5e-3 * scale
        assert abs(float(m_h.drag) - float(m_ref.drag)) < 1e-3
