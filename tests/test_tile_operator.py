"""Tile-assembled operator == element-matrix operator, to roundoff."""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import generators, taylor_hood
from navier_stokes_equations_tpu.ops import (
    assembly,
    fe_arrays,
    operators,
    tile_operator,
)


@pytest.fixture(scope="module", params=["2d", "3d"])
def fixture_mesh_fe(request, mesh2d):
    if request.param == "2d":
        mesh = mesh2d
    else:
        mesh = taylor_hood.build(
            generators.channel_cylinder_3d(h_far=0.18, h_cyl=0.08, n_layers=2)
        )
    fe = fe_arrays.build_fe_arrays(mesh, dtype=jnp.float64)
    return mesh, fe


@pytest.mark.parametrize("tile_e", [16, 32])
@pytest.mark.parametrize("supg", [False, True])
def test_tile_operator_matches_element_matrices(fixture_mesh_fe, supg, tile_e):
    mesh, fe = fixture_mesh_fe
    rng = np.random.default_rng(21)
    params = assembly.StepParams(
        dt=0.05, theta=0.6, nu=0.01, rho=1.0, gamma=0.1, use_supg=supg
    )
    u_adv = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3)
    x = jnp.asarray(rng.normal(size=fe.n_dofs))

    dvv, cvv, avp, apv, _ = assembly.oseen_blocks(fe, params, u_adv, u_adv * 0.5)
    A_e, _ = assembly.oseen_system(fe, params, u_adv, u_adv * 0.5)
    tiles = tile_operator.build_tile_arrays(mesh, fe, tile_e=tile_e)
    blk = tile_operator.build_tile_blocks(fe, tiles, dvv, cvv, avp, apv)
    assert (blk.S is None) == supg  # grad-div couples components
    op = tile_operator.make_tile_operator(fe, tiles, blk)

    y_ref = operators.apply_element_matrices(fe, A_e, x)
    y_t = op(x)
    scale = np.abs(np.asarray(y_ref)).max()
    np.testing.assert_allclose(
        np.asarray(y_t), np.asarray(y_ref), atol=1e-12 * scale, rtol=1e-11
    )


def test_tile_newton_blocks_match(fixture_mesh_fe):
    mesh, fe = fixture_mesh_fe
    rng = np.random.default_rng(22)
    params = assembly.StepParams(
        dt=0.05, theta=0.6, nu=0.01, rho=1.0, gamma=0.1, use_supg=fe.dim == 3
    )
    u_cur = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3)
    p_cur = jnp.asarray(rng.normal(size=fe.n_p) * 0.1)
    x = jnp.asarray(rng.normal(size=fe.n_dofs))

    dvv, cvv, avp, apv, _, _ = assembly.newton_blocks(
        fe, params, u_cur, p_cur, u_cur * 0.5
    )
    A_e, _ = assembly.newton_system(fe, params, u_cur, p_cur, u_cur * 0.5)
    tiles = tile_operator.build_tile_arrays(mesh, fe, tile_e=16)
    blk = tile_operator.build_tile_blocks(fe, tiles, dvv, cvv, avp, apv)
    op = tile_operator.make_tile_operator(fe, tiles, blk)

    y_ref = operators.apply_element_matrices(fe, A_e, x)
    scale = np.abs(np.asarray(y_ref)).max()
    np.testing.assert_allclose(
        np.asarray(op(x)), np.asarray(y_ref), atol=1e-12 * scale
    )


def test_tile_blocks_match(fixture_mesh_fe):
    """velocity_block / divergence sub-applies match the element path."""
    mesh, fe = fixture_mesh_fe
    rng = np.random.default_rng(23)
    params = assembly.StepParams(
        dt=0.05, theta=0.6, nu=0.01, rho=1.0, gamma=0.1, use_supg=True
    )
    u_adv = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3)
    x = jnp.asarray(rng.normal(size=fe.n_dofs))
    mask = jnp.zeros(fe.n_dofs, bool)

    dvv, cvv, avp, apv, _ = assembly.oseen_blocks(fe, params, u_adv, u_adv)
    A_e, _ = assembly.oseen_system(fe, params, u_adv, u_adv)
    tiles = tile_operator.build_tile_arrays(mesh, fe, tile_e=16)
    blk = tile_operator.build_tile_blocks(fe, tiles, dvv, cvv, avp, apv)
    op = tile_operator.make_tile_operator(fe, tiles, blk)

    x_u = x.at[fe.n_udofs :].set(0.0)
    y_ref = operators.velocity_block_apply(fe, A_e, mask, x_u)
    y_t = op.velocity_block(x).at[fe.n_udofs :].set(0.0)
    scale = np.abs(np.asarray(y_ref)).max()
    np.testing.assert_allclose(np.asarray(y_t), np.asarray(y_ref), atol=1e-12 * scale)

    d_ref = operators.divergence_block_apply(fe, A_e, mask, x_u)
    d_t = op.divergence(x)
    scale = np.abs(np.asarray(d_ref)).max()
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_ref), atol=1e-12 * scale)


def test_fast_oseen_build_matches_generic(fixture_mesh_fe):
    """Static-tables Oseen build == generic element-block build (the same
    weak form reassociated over quadrature points; f64 roundoff only)."""
    import dataclasses as dc

    mesh, fe = fixture_mesh_fe
    rng = np.random.default_rng(25)
    params = assembly.StepParams(
        dt=0.05, theta=0.6, nu=0.01, rho=1.0, gamma=0.1, use_supg=False
    )
    u_adv = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3)
    x = jnp.asarray(rng.normal(size=fe.n_dofs))

    tiles = tile_operator.build_tile_arrays(mesh, fe, tile_e=16)
    tiles = dc.replace(tiles, statics=tile_operator.build_tile_statics(fe, tiles))
    dvv, cvv, avp, apv, _ = assembly.oseen_blocks(fe, params, u_adv, u_adv * 0.5)
    blk_gen = tile_operator.build_tile_blocks(fe, tiles, dvv, cvv, avp, apv)
    blk_fast = tile_operator.build_tile_blocks_oseen(fe, tiles, params, u_adv)

    for a, b in ((blk_gen.S, blk_fast.S), (blk_gen.G, blk_fast.G), (blk_gen.H, blk_fast.H)):
        scale = np.abs(np.asarray(a)).max()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-12 * scale)

    y_fast = tile_operator.make_tile_operator(fe, tiles, blk_fast)(x)
    A_e, _ = assembly.oseen_system(fe, params, u_adv, u_adv * 0.5)
    y_ref = operators.apply_element_matrices(fe, A_e, x)
    scale = np.abs(np.asarray(y_ref)).max()
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref), atol=1e-12 * scale)


def test_blocks_diag_matches_element_diag(fixture_mesh_fe):
    mesh, fe = fixture_mesh_fe
    rng = np.random.default_rng(24)
    params = assembly.StepParams(
        dt=0.05, theta=0.6, nu=0.01, rho=1.0, gamma=0.1, use_supg=True
    )
    u_adv = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3)
    dvv, cvv, avp, apv, _ = assembly.oseen_blocks(fe, params, u_adv, u_adv)
    A_e, _ = assembly.oseen_system(fe, params, u_adv, u_adv)
    d_blocks = np.asarray(assembly.blocks_diag(fe, dvv, cvv))
    d_elem = np.asarray(jnp.diagonal(A_e, axis1=1, axis2=2))
    np.testing.assert_allclose(d_blocks, d_elem, atol=1e-13 * np.abs(d_elem).max())


def test_solver_tile_path_matches_quadrature(mesh2d_path):
    """Short 2D-2 trajectory: tile operator path tracks the quadrature path.

    Both paths evaluate the identical bilinear form (to roundoff), so at
    fixed Krylov tolerance the physics metrics must agree far inside any
    physical tolerance."""
    import dataclasses

    from navier_stokes_equations_tpu.config import NonlinearMethod
    from navier_stokes_equations_tpu.models import solver, test_cases

    res = {}
    for path in ("quadrature", "tile"):
        cfg = dataclasses.replace(
            test_cases.make("2D-2", deltat=0.01, nm=NonlinearMethod.LINEARIZED),
            dtype="float64",
            operator_path=path,
        )
        s = solver.NavierStokesSolver(cfg, mesh2d_path)
        _, hist = s.run(n_steps=8)
        assert all(h["converged"] for h in hist)
        res[path] = np.array([[h["Cd"], h["Cl"], h["DeltaP"]] for h in hist])
    err = np.abs(res["tile"] - res["quadrature"]).max()
    scale = np.abs(res["quadrature"]).max()
    assert err < 1e-6 * scale


def test_solver_tile_path_newton(mesh2d_path):
    """Newton on the tile path: converges and matches the quadrature path."""
    import dataclasses

    from navier_stokes_equations_tpu.models import solver, test_cases

    res = {}
    for path in ("quadrature", "tile"):
        cfg = dataclasses.replace(
            test_cases.make("2D-1", deltat=0.1), dtype="float64",
            operator_path=path,
        )
        s = solver.NavierStokesSolver(cfg, mesh2d_path)
        _, hist = s.run(n_steps=3)
        assert all(h["converged"] for h in hist)
        res[path] = np.array([[h["Cd"], h["Cl"], h["DeltaP"]] for h in hist])
    err = np.abs(res["tile"] - res["quadrature"]).max()
    scale = np.abs(res["quadrature"]).max()
    assert err < 1e-6 * scale
