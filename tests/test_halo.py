"""Halo-exchange SPMD: distributed matvec == single-device matvec.

The halo layout is the scalable analog of the reference's ghosted vectors +
compress(add) (reference: NavierStokes.cpp:205-220, 527-528): per-shard
owned/ghost DoFs, neighbor-only ppermute messages, O(interface) traffic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import generators, taylor_hood
from navier_stokes_equations_tpu.models import test_cases
from navier_stokes_equations_tpu.ops import assembly, fe_arrays, operators
from navier_stokes_equations_tpu.parallel import halo, sharding

N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    # Uniform channel: equal-count RCB strips are geometric strips, so the
    # one-hop halo property holds.  (Strongly graded meshes need the
    # geometric strip partitioner — see halo.py docstring / round-2 note.)
    mesh = taylor_hood.build(generators.rect_2d(2.2, 0.41, 96, 18))
    mesh = sharding.partition_mesh(mesh, N_DEV)
    mesh = taylor_hood.pad_elements(mesh, N_DEV)
    fe = fe_arrays.build_fe_arrays(mesh, dtype=jnp.float64)
    params = assembly.StepParams(
        dt=0.01, theta=0.5, nu=1e-3, rho=1.0, gamma=0.1, use_supg=False
    )
    rng = np.random.default_rng(3)
    u_star = jnp.asarray(rng.standard_normal((fe.n_vnodes, 2)))
    A_e, _ = assembly.oseen_system(fe, params, u_star, u_star)
    return mesh, fe, A_e


def test_halo_decomposition_covers_all_dofs(setup):
    mesh, fe, A_e = setup
    d = halo.build_halo_decomposition(fe, N_DEV)
    owned = np.asarray(d.owned_ids)
    real = owned[owned < fe.n_dofs]
    assert len(real) == fe.n_dofs
    assert len(np.unique(real)) == fe.n_dofs  # disjoint ownership
    # Halo is a small interface layer, not a copy of the domain.
    assert d.n_halo_max < fe.n_dofs // N_DEV


def test_halo_matvec_matches_single_device(setup):
    mesh, fe, A_e = setup
    d = halo.build_halo_decomposition(fe, N_DEV)
    dev_mesh = sharding.make_device_mesh(N_DEV, axis=d.axis)
    d_sh = halo.shard_decomposition(d, dev_mesh)
    apply_halo = halo.make_halo_operator(d_sh, dev_mesh)

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(fe.n_dofs))
    y_ref = operators.apply_element_matrices(fe, A_e, x)

    x_own = halo.scatter_owned(d_sh, x)
    y_own = jax.jit(apply_halo)(A_e, x_own)
    y = halo.gather_global(d_sh, y_own)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-12, atol=1e-12)


def test_halo_roundtrip(setup):
    mesh, fe, A_e = setup
    d = halo.build_halo_decomposition(fe, N_DEV)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(fe.n_dofs))
    x2 = halo.gather_global(d, halo.scatter_owned(d, x))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=0, atol=0)


def test_halo_fgmres_matches_single_device_solve(setup):
    """Distributed FGMRES over the halo layout solves the constrained Oseen
    system to the same solution as the single-device solver (only the
    matvec communicates: one-hop ppermute ghost exchange + psum dots)."""
    import jax.numpy as jnp

    from navier_stokes_equations_tpu.ops import dirichlet as ddm
    from navier_stokes_equations_tpu.solvers import gmres

    mesh, fe, _ = setup
    # Mass-dominated (small dt) Oseen system so that unpreconditioned FGMRES
    # converges tightly — this tests the distributed LAYOUT, not the
    # preconditioner.
    params = assembly.StepParams(
        dt=1e-4, theta=0.5, nu=1e-3, rho=1.0, gamma=0.1, use_supg=False
    )
    rng = np.random.default_rng(2)
    u_star = jnp.asarray(rng.standard_normal((fe.n_vnodes, 2)))
    A_e, _ = assembly.oseen_system(fe, params, u_star, u_star)

    d = halo.build_halo_decomposition(fe, N_DEV)
    dev_mesh = sharding.make_device_mesh(N_DEV, axis=d.axis)
    d_sh = halo.shard_decomposition(d, dev_mesh)

    dd = ddm.build_dirichlet(mesh, fe, dtype=jnp.float64)
    cfg_inlet = test_cases.benchmark_inlet(2, 0.3, time_dependent=False)
    g = dd.values(cfg_inlet, jnp.asarray(5.0))
    b = jnp.asarray(rng.standard_normal(fe.n_dofs)) * 1e-3
    # Constrain the pressure rows too: unpreconditioned Krylov cannot solve
    # the full saddle-point system; the velocity block alone converges and
    # exercises the distributed layout end-to-end just the same.
    mask = dd.mask | (jnp.arange(fe.n_dofs) >= fe.n_udofs)
    g = jnp.where(jnp.arange(fe.n_dofs) >= fe.n_udofs, 0.0, g)

    # Single-device reference: row-constrained operator + FGMRES.
    raw = lambda v: operators.apply_element_matrices(fe, A_e, v)
    apply_ref = operators.row_constrain_operator(raw, mask)
    b_hat = jnp.where(mask, g, b)
    x0 = jnp.where(mask, g, 0.0)
    ref = gmres.fgmres(apply_ref, b_hat, x0=x0, restart=200, maxiter=200, rtol=1e-9)

    x_halo, res = halo.halo_fgmres(
        d_sh, dev_mesh, A_e, b, g, mask, restart=200, maxiter=200, rtol=1e-9
    )
    assert bool(ref.converged), float(ref.residual)
    assert bool(res.converged), float(res.residual)
    # Same system solved to the same tolerance in two layouts.
    scale = float(jnp.max(jnp.abs(ref.x)))
    np.testing.assert_allclose(
        np.asarray(x_halo), np.asarray(ref.x), rtol=0, atol=1e-6 * scale
    )


def test_halo_preconditioned_saddle_solve(setup):
    """FULL saddle-point solve on the halo layout with the distributed
    Cahouet-Chabard preconditioner == the single-device preconditioned
    solve (same system, same tolerance)."""
    import jax.numpy as jnp

    from navier_stokes_equations_tpu.ops import dirichlet as ddm
    from navier_stokes_equations_tpu.solvers import gmres, preconditioners

    mesh, fe, A_e = setup
    dd = ddm.build_dirichlet(mesh, fe, dtype=jnp.float64)
    pin = ddm.pressure_pin_mask(mesh, fe)
    pops = preconditioners.build_pressure_operators(fe, pin, dense_max=10**6)
    assert pops.dense
    cfg_inlet = test_cases.benchmark_inlet(2, 0.3, time_dependent=False)
    g = dd.values(cfg_inlet, jnp.asarray(5.0))
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal(fe.n_dofs)) * 1e-3
    dt, theta, nu, rho = 0.01, 0.5, 1e-3, 1.0
    diag = operators.extract_diagonal(fe, A_e, dd.mask)

    # Single-device preconditioned reference.
    raw = lambda v: operators.apply_element_matrices(fe, A_e, v)
    apply_ref = operators.row_constrain_operator(raw, dd.mask)
    pc_ref = preconditioners.make_cahouet_chabard(
        fe, pops, A_e, dd.mask, dt=dt, theta=theta, nu=nu, rho=rho,
        vel_method="jacobi", vel_sweeps=1,
    )
    b_hat = jnp.where(dd.mask, g, b)
    x0 = jnp.where(dd.mask, g, 0.0)
    ref = gmres.fgmres(
        apply_ref, b_hat, precond=pc_ref, x0=x0, restart=150, maxiter=400, rtol=1e-8
    )
    assert bool(ref.converged)

    # Distributed: halo matvec + owned-layout Cahouet-Chabard.
    d = halo.build_halo_decomposition(fe, N_DEV)
    dev_mesh = sharding.make_device_mesh(N_DEV, axis=d.axis)
    d_sh = halo.shard_decomposition(d, dev_mesh)
    apply_halo = halo.make_halo_operator(d_sh, dev_mesh)
    pc_halo = halo.halo_cahouet_chabard(
        d_sh, apply_halo, fe, pops, A_e, dd.mask, diag, dt, theta, nu, rho
    )
    x_halo, res = halo.halo_fgmres(
        d_sh, dev_mesh, A_e, b, g, dd.mask,
        restart=150, maxiter=400, rtol=1e-8, precond=pc_halo,
    )
    assert bool(res.converged), float(res.residual)
    scale = float(jnp.max(jnp.abs(ref.x)))
    np.testing.assert_allclose(
        np.asarray(x_halo), np.asarray(ref.x), rtol=0, atol=1e-5 * scale
    )


def test_halo_geometric_strips_on_graded_cylinder_mesh():
    """Geometric-width strips keep the one-hop halo property on the graded
    channel-cylinder mesh (where equal-count strips fail), and the
    distributed matvec still matches single-device exactly."""
    if jax.device_count() < N_DEV:
        pytest.skip("needs 8 devices")
    mesh = taylor_hood.build(generators.channel_cylinder_2d(0.07, 0.02))
    fe = fe_arrays.build_fe_arrays(mesh, dtype=jnp.float64)
    params = assembly.StepParams(
        dt=0.01, theta=0.5, nu=1e-3, rho=1.0, gamma=0.1, use_supg=False
    )
    rng = np.random.default_rng(9)
    u_star = jnp.asarray(rng.standard_normal((fe.n_vnodes, 2)))
    A_e, _ = assembly.oseen_system(fe, params, u_star, u_star)

    cent = mesh.vertices[mesh.elems_p1[: mesh.n_el_real]].mean(axis=1)
    strips = halo.geometric_strips(cent, N_DEV)
    d = halo.build_halo_decomposition(fe, N_DEV, strips=strips)
    dev_mesh = sharding.make_device_mesh(N_DEV, axis=d.axis)
    d_sh = halo.shard_decomposition(d, dev_mesh)
    apply_halo = halo.make_halo_operator(d_sh, dev_mesh)

    x = jnp.asarray(rng.standard_normal(fe.n_dofs))
    y_ref = operators.apply_element_matrices(fe, A_e, x)
    y = halo.gather_global(d_sh, jax.jit(apply_halo)(A_e, halo.scatter_owned(d_sh, x)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-12, atol=1e-12)


def test_halo_rejects_non_strip_partitions(setup):
    """Equal-count strips on the graded cylinder mesh violate the one-hop
    property; the decomposition must refuse loudly, not corrupt silently."""
    mesh = taylor_hood.build(generators.channel_cylinder_2d(0.07, 0.02))
    mesh = sharding.partition_mesh(mesh, N_DEV)
    mesh = taylor_hood.pad_elements(mesh, N_DEV)
    fe = fe_arrays.build_fe_arrays(mesh, dtype=jnp.float64)
    with pytest.raises(ValueError, match="strip"):
        halo.build_halo_decomposition(fe, N_DEV)


def test_geometric_strips_reject_empty():
    cent = np.linspace(0.0, 1.0, 10)[:, None] * np.ones((10, 2))
    with pytest.raises(ValueError, match="empty"):
        halo.geometric_strips(cent, 64)
