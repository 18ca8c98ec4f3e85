"""Block-DIAGONAL preconditioner structure (capability parity).

The reference exposes two composed preconditioners: the block-triangular
Cahouet-Chabard it actually uses (NavierStokes.hpp:279-366) and a
block-diagonal variant (NavierStokes.hpp:242-277: velocity AMG + ILU on the
pressure mass, applied independently).  ``precond_structure="diagonal"``
exposes the latter's structure: same velocity solve, pressure solve applied
to r_p directly, NO divergence coupling.  (The pressure block is the CC
Schur action, not the reference's literal unscaled ILU(M_p) — see
preconditioners.make_cahouet_chabard and PARITY.md.)
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


def _make(fe, diri, pops, structure):
    params = assembly.StepParams(
        dt=0.01, theta=0.5, nu=0.001, rho=1.0, gamma=0.1, use_supg=False
    )
    u_adv = jnp.zeros((fe.n_vnodes, fe.dim), jnp.float64)
    op = matfree.make_system_operator(fe, params, u_adv)
    diag_e, _ = assembly.oseen_rhs_diag(fe, params, u_adv, u_adv)
    mask = diri.mask
    diag = jnp.where(mask, 1.0, operators.scatter_add(fe, diag_e))
    diag = jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)
    calls = {"div": 0}

    def vel_apply(z):
        zf = jnp.where(mask, 0.0, z.at[fe.n_udofs:].set(0.0))
        y = op.velocity_block(zf).at[fe.n_udofs:].set(0.0)
        return jnp.where(mask, z, y)

    def div_apply(z_u):
        calls["div"] += 1
        return op.divergence(jnp.where(mask, 0.0, z_u))

    p = pc.make_cahouet_chabard(
        fe, pops, None, mask, dt=0.01, theta=0.5, nu=0.001, rho=1.0,
        vel_method="jacobi", vel_apply=vel_apply, div_apply=div_apply,
        diag=diag, structure=structure,
    )
    return p, calls, mask


def test_diagonal_structure_decouples_blocks(setup):
    """Velocity rows match triangular step 1; the divergence block is never
    applied (hpp:263-268 applies the two block solves independently); the
    pressure rows equal the Schur action on r_p alone — i.e. what the
    triangular path produces when the velocity residual is zero (z_u = 0 =>
    t = r_p - B*0 = r_p)."""
    _, fe, diri, pops = setup
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal(fe.n_dofs))
    p_tri, _, _ = _make(fe, diri, pops, "triangular")
    p_diag, calls, _ = _make(fe, diri, pops, "diagonal")
    z_tri = p_tri(r)
    z_diag = p_diag(r)
    assert calls["div"] == 0
    np.testing.assert_allclose(
        np.asarray(z_diag[: fe.n_udofs]), np.asarray(z_tri[: fe.n_udofs]),
        rtol=1e-12, atol=1e-12,
    )
    z_tri_p_only = p_tri(r.at[: fe.n_udofs].set(0.0))
    np.testing.assert_allclose(
        np.asarray(z_diag[fe.n_udofs:]), np.asarray(z_tri_p_only[fe.n_udofs:]),
        rtol=1e-12, atol=1e-12,
    )


def test_unknown_structure_rejected(setup):
    _, fe, diri, pops = setup
    with pytest.raises(ValueError, match="structure"):
        _make(fe, diri, pops, "bogus")


@pytest.mark.parametrize("operator_path", ["quadrature", "tile"])
def test_diagonal_e2e_same_physics(mesh2d_path, operator_path):
    """Preconditioner-only change: converged steps land on the same state
    (more Krylov iterations are expected — FGMRES compensates the weaker
    preconditioner, exactly as in the reference's GMRES)."""
    cfg0 = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01), dtype="float64",
        operator_path=operator_path,
    )
    cfg1 = dataclasses.replace(cfg0, precond_structure="diagonal",
                               gmres_maxiter_linear=400, gmres_alloc=128)
    s0 = solver.NavierStokesSolver(cfg0, mesh2d_path)
    s1 = solver.NavierStokesSolver(cfg1, mesh2d_path)
    st0, st1 = s0.initial_state(), s1.initial_state()
    for _ in range(2):
        st0, m0 = s0.step(st0)
        st1, m1 = s1.step(st1)
        assert bool(m1.converged)
        scale = float(jnp.max(jnp.abs(st0.x_old))) + 1e-30
        assert float(jnp.max(jnp.abs(st1.x_old - st0.x_old))) < 5e-3 * scale
        assert abs(float(m1.drag) - float(m0.drag)) < 1e-3


def test_halo_layout_rejects_unknown_structure(mesh2d_path):
    # The diagonal structure is now SUPPORTED on the halo layout
    # (tests/test_halo_precond_parity.py gates its trajectory); only an
    # unknown structure value is rejected.
    from navier_stokes_equations_tpu.parallel import halo_solver

    cfg = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01), dtype="float64",
        precond_structure="ilu", precond_vel_method="jacobi",
    )
    with pytest.raises(ValueError, match="structure"):
        halo_solver.HaloNavierStokesSolver(cfg, taylor_hood.load(mesh2d_path))
