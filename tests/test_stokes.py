"""End-to-end linear solves on the real benchmark mesh (no time loop yet).

Validates the full stack — assembly, Dirichlet elimination, FGMRES,
Cahouet-Chabard preconditioner, functionals — on single implicit solves.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.ops import assembly, dirichlet, fe_arrays, functionals, operators
from navier_stokes_equations_tpu.solvers import gmres, preconditioners


H = 0.41


def _inlet_parabola(coords, U_m):
    y = coords[:, 1]
    vals = jnp.zeros_like(coords)
    return vals.at[:, 0].set(4.0 * U_m * y * (H - y) / (H * H))


@pytest.fixture(scope="module")
def stack(mesh2d):
    fe = fe_arrays.build_fe_arrays(mesh2d, dtype=jnp.float64)
    dd = dirichlet.build_dirichlet(mesh2d, fe, dtype=jnp.float64)
    pin = dirichlet.pressure_pin_mask(mesh2d, fe)
    pops = preconditioners.build_pressure_operators(fe, pin)
    return mesh2d, fe, dd, pops


def _solve_step(mesh, fe, dd, pops, dt, theta, nu, U_m, rtol=1e-8, maxiter=2000):
    params = assembly.StepParams(dt=dt, theta=theta, nu=nu, rho=1.0, gamma=0.1, use_supg=False)
    z = jnp.zeros((fe.n_vnodes, mesh.dim), jnp.float64)
    A_e, b_e = assembly.oseen_system(fe, params, z, z)
    b = operators.scatter_add(fe, b_e)
    g = dd.values(lambda c, t: _inlet_parabola(c, U_m), 0.0)
    b_hat = operators.constrained_rhs(fe, A_e, b, dd.mask, g)
    apply_a = operators.make_constrained_operator(fe, A_e, dd.mask)
    precond = preconditioners.make_cahouet_chabard(
        fe, pops, A_e, dd.mask, dt=dt, theta=theta, nu=nu, rho=1.0
    )
    res = gmres.fgmres(apply_a, b_hat, precond=precond, restart=150, maxiter=maxiter, rtol=rtol)
    return res, fe.split(res.x)


def test_first_be_step_conservation(stack):
    """One BE step from rest (2D-1-like): converges, BCs exact, mass balance."""
    mesh, fe, dd, pops = stack
    U_m = 0.3
    nu = (2.0 / 3.0) * U_m * 0.1 / 20.0
    res, (u, p) = _solve_step(mesh, fe, dd, pops, dt=0.1, theta=1.0, nu=nu, U_m=U_m)
    assert bool(res.converged)

    # Dirichlet values are carried exactly by construction.
    inlet = np.asarray(dd.inlet_nodes)
    y = np.asarray(dd.inlet_coords)[:, 1]
    np.testing.assert_allclose(
        np.asarray(u)[inlet, 0], 4.0 * U_m * y * (H - y) / H**2, atol=1e-12
    )
    walls = np.asarray(dd.zero_vel_nodes)
    np.testing.assert_allclose(np.asarray(u)[walls], 0.0, atol=1e-12)

    # Global mass balance: flux(inlet) + flux(outlet) ~ 0 (n is outward).
    ft_in = functionals.build_force_tables(mesh, fe, jnp.float64, bid=101)
    ft_out = functionals.build_force_tables(mesh, fe, jnp.float64, bid=102)
    fin = float(functionals.boundary_flux(fe, ft_in, u))
    fout = float(functionals.boundary_flux(fe, ft_out, u))
    q_in = 4 * U_m * (H**3 / 6) / H**2  # int of the parabola = (2/3) U_m H
    assert fin == pytest.approx(-q_in, rel=1e-10)
    # Pressure is pinned on the whole outlet (reference: cpp:631-637), which
    # removes those continuity test functions: mass balance holds only up to
    # a small outlet-local defect, not to solver precision.
    assert fin + fout == pytest.approx(0.0, abs=1e-2 * q_in)

    # Pressure drop across the cylinder is positive and O(0.1).
    pt = functionals.build_probe_tables(mesh)
    dp = float(functionals.pressure_difference(fe, pt, p))
    assert 0.0 < dp < 1.0

    # Functionals produce finite, plausible values.
    ftab = functionals.build_force_tables(mesh, fe, jnp.float64)
    cd, cl = functionals.lift_drag(fe, ftab, u, p, nu=nu, rho=1.0, U_m=U_m)
    assert np.isfinite(float(cd)) and np.isfinite(float(cl))
    assert 0.0 < float(cd) < 50.0


def test_steady_stokes(stack):
    """dt -> inf: pure Stokes. Tests the stiffness-dominated regime."""
    mesh, fe, dd, pops = stack
    U_m = 0.3
    nu = (2.0 / 3.0) * U_m * 0.1 / 20.0
    res, (u, p) = _solve_step(
        mesh, fe, dd, pops, dt=1e12, theta=1.0, nu=nu, U_m=U_m, rtol=1e-8, maxiter=6000
    )
    # Mass balance even if not fully converged to rtol.
    ft_in = functionals.build_force_tables(mesh, fe, jnp.float64, bid=101)
    ft_out = functionals.build_force_tables(mesh, fe, jnp.float64, bid=102)
    fin = float(functionals.boundary_flux(fe, ft_in, u))
    fout = float(functionals.boundary_flux(fe, ft_out, u))
    assert fin + fout == pytest.approx(0.0, abs=1e-2 * abs(fin))
    # Stokes drag on the DFG geometry at nu=0.001, U_m=0.3 is order 10.
    ftab = functionals.build_force_tables(mesh, fe, jnp.float64)
    cd, cl = functionals.lift_drag(fe, ftab, u, p, nu=nu, rho=1.0, U_m=U_m)
    assert 1.0 < float(cd) < 100.0
    assert abs(float(cl)) < 5.0


def test_two_level_schur_converges_like_dense():
    """Aggregation two-grid K_p^{-1} (the beyond-dense-limit path) drives the
    same benchmark step to the same physics as the dense inverse."""
    import dataclasses

    from navier_stokes_equations_tpu.models import solver as slv
    from navier_stokes_equations_tpu.models import test_cases

    mesh_path = "/root/reference/meshes/mesh-2D.msh"
    results = {}
    for dm in (20000, 0):  # dense vs forced two-level
        cfg = dataclasses.replace(
            test_cases.make("2D-2", deltat=0.01),
            dtype="float64",
            precond_schur_dense_max=dm,
        )
        s = slv.NavierStokesSolver(cfg, mesh_path)
        assert s.pressure_ops.dense == (dm > 0)
        assert s.pressure_ops.two_level == (dm == 0)
        st = s.initial_state()
        for _ in range(3):
            st, m = s.step(st)
        assert bool(m.converged)
        results[dm] = float(m.drag)
    assert abs(results[20000] - results[0]) < 1e-4
