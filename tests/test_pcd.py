"""PCD Schur variant: reduction to Cahouet-Chabard and trajectory parity.

PCD (S^{-1} ~ -M_p^{-1} F_p K_p^{-1}, F_p = (rho/dt)M_p + theta(nu K_p +
N_p(u*))) must coincide with Cahouet-Chabard exactly when the advection
field vanishes, and must not change converged physics when it doesn't.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.ops import assembly, dirichlet, fe_arrays, matfree, operators
from navier_stokes_equations_tpu.solvers import preconditioners as pc


@pytest.fixture(scope="module")
def setup(mesh2d_path):
    mesh = taylor_hood.load(mesh2d_path)
    fe = fe_arrays.build_fe_arrays(mesh, dtype=jnp.float64)
    diri = dirichlet.build_dirichlet(mesh, fe, dtype=jnp.float64)
    pin = dirichlet.pressure_pin_mask(mesh, fe)
    pops = pc.build_pressure_operators(fe, pin, dense_max=0)
    return mesh, fe, diri, pops


def _preconds(fe, diri, pops, u_adv, schur):
    params = assembly.StepParams(
        dt=0.01, theta=0.5, nu=0.001, rho=1.0, gamma=0.1, use_supg=False
    )
    op = matfree.make_system_operator(fe, params, u_adv)
    diag_e, _ = assembly.oseen_rhs_diag(
        fe, params, u_adv, jnp.zeros_like(u_adv)
    )
    mask = diri.mask
    diag = jnp.where(mask, 1.0, operators.scatter_add(fe, diag_e))
    diag = jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)

    def vel_apply(z):
        zf = jnp.where(mask, 0.0, z.at[fe.n_udofs :].set(0.0))
        y = op.velocity_block(zf).at[fe.n_udofs :].set(0.0)
        return jnp.where(mask, z, y)

    def div_apply(z_u):
        return op.divergence(jnp.where(mask, 0.0, z_u))

    return pc.make_cahouet_chabard(
        fe, pops, None, mask, dt=0.01, theta=0.5, nu=0.001, rho=1.0,
        vel_method="jacobi", vel_apply=vel_apply, div_apply=div_apply,
        diag=diag, schur=schur, u_adv=u_adv if schur == "pcd" else None,
    )


def test_pcd_reduces_to_cc_at_zero_advection(setup):
    _, fe, diri, pops = setup
    rng = np.random.default_rng(0)
    u0 = jnp.zeros((fe.n_vnodes, fe.dim), jnp.float64)
    r = jnp.asarray(rng.standard_normal(fe.n_dofs))
    z_cc = _preconds(fe, diri, pops, u0, "cc")(r)
    z_pcd = _preconds(fe, diri, pops, u0, "pcd")(r)
    # F_p K_p^{-1} with N_p = 0 equals (rho/dt) M_p K_p^{-1} + theta nu I,
    # so after M_p^{-1}... the two differ only through the lumped-mass
    # commutation: M_lump^{-1} M_p K_p^{-1} vs K_p^{-1}.  Verify agreement
    # to the lumping error, and exact equality of the velocity rows.
    np.testing.assert_allclose(
        np.asarray(z_pcd[: fe.n_udofs]), np.asarray(z_cc[: fe.n_udofs]),
        rtol=1e-12, atol=1e-12,
    )
    num = float(jnp.linalg.norm(z_pcd[fe.n_udofs :] - z_cc[fe.n_udofs :]))
    den = float(jnp.linalg.norm(z_cc[fe.n_udofs :]))
    assert num < 0.35 * den  # consistent-vs-lumped mass difference only


def test_pcd_e2e_matches_cc_trajectory(mesh2d_path):
    """Preconditioner-only change: converged physics identical."""
    cfg0 = dataclasses.replace(test_cases.make("2D-2", deltat=0.01), dtype="float64")
    cfg1 = dataclasses.replace(cfg0, precond_schur="pcd")
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
    assert int(m1.gmres_iters) <= 2 * int(m0.gmres_iters)


def test_pcd_newton_path_runs(mesh2d_path):
    """PCD through the Newton path (u_adv = current iterate)."""
    cfg = dataclasses.replace(
        test_cases.make("2D-1", deltat=0.1), dtype="float64", precond_schur="pcd"
    )
    s = solver.NavierStokesSolver(cfg, mesh2d_path)
    st = s.initial_state()
    st, m = s.step(st)
    assert bool(m.converged)
    assert np.isfinite(float(m.drag))
