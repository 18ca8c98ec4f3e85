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


def test_tile_local_representation(fixture_mesh_fe):
    """Consistency round trip + tile-local operator == nodal tile operator."""
    mesh, fe = fixture_mesh_fe
    rng = np.random.default_rng(26)
    params = assembly.StepParams(
        dt=0.05, theta=0.6, nu=0.01, rho=1.0, gamma=0.1, use_supg=True
    )
    u_adv = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3)
    x = jnp.asarray(rng.normal(size=fe.n_dofs))
    tiles = tile_operator.build_tile_arrays(mesh, fe, tile_e=16)

    # Round trip and owner-mask norm.
    xt = tile_operator.to_tiles(fe, tiles, x)
    np.testing.assert_array_equal(
        np.asarray(tile_operator.from_tiles(fe, tiles, xt)), np.asarray(x)
    )
    w = tiles.wmask.reshape(-1)
    np.testing.assert_allclose(
        float(jnp.sum(w * xt * xt)), float(jnp.vdot(x, x)), rtol=1e-12
    )

    dvv, cvv, avp, apv, _ = assembly.oseen_blocks(fe, params, u_adv, u_adv)
    blk = tile_operator.build_tile_blocks(fe, tiles, dvv, cvv, avp, apv)
    op_n = tile_operator.make_tile_operator(fe, tiles, blk)
    op_l = tile_operator.make_tile_operator_local(fe, tiles, blk)

    y_n = np.asarray(op_n(x))
    y_l = np.asarray(tile_operator.from_tiles(fe, tiles, op_l(xt)))
    scale = np.abs(y_n).max()
    np.testing.assert_allclose(y_l, y_n, atol=1e-12 * scale)

    # The local result must be CONSISTENT (all slots of a node agree).
    rows = np.asarray(op_l(xt)).reshape(-1, fe.dim + 1)
    nodes = np.asarray(tiles.tile_nodes).reshape(-1)
    for comp in range(fe.dim):
        per_node = {}
        for s, nd in enumerate(nodes):
            if nd < fe.n_vnodes:
                per_node.setdefault(nd, []).append(rows[s, comp])
        spread = max(
            (max(v) - min(v)) for v in per_node.values() if len(v) > 1
        )
        assert spread < 1e-11 * scale

    # divergence -> nodal pressure rows.
    d_n = np.asarray(op_n.divergence(x.at[fe.n_udofs:].set(0.0)))
    d_l = np.asarray(op_l.divergence(tile_operator.to_tiles(
        fe, tiles, x.at[fe.n_udofs:].set(0.0))))
    np.testing.assert_allclose(d_l, d_n, atol=1e-12 * np.abs(d_n).max())


def test_fgmres_weighted_matches_unweighted():
    """weight=1 reproduces the plain trajectory bit-for-bit."""
    from navier_stokes_equations_tpu.solvers import gmres

    rng = np.random.default_rng(5)
    n = 40
    A = jnp.asarray(rng.normal(size=(n, n)) + 4 * np.eye(n))
    b = jnp.asarray(rng.normal(size=n))
    r1 = gmres.fgmres(lambda v: A @ v, b, rtol=1e-10, maxiter=40)
    r2 = gmres.fgmres(
        lambda v: A @ v, b, rtol=1e-10, maxiter=40, weight=jnp.ones(n)
    )
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
    assert int(r1.iterations) == int(r2.iterations)


def test_solver_tile_resident_matches_nodal(mesh2d_path):
    """tile_resident=True reproduces the nodal tile path's physics."""
    import dataclasses

    from navier_stokes_equations_tpu.config import NonlinearMethod
    from navier_stokes_equations_tpu.models import solver, test_cases

    res = {}
    for resident in (False, True):
        cfg = dataclasses.replace(
            test_cases.make("2D-2", deltat=0.01, nm=NonlinearMethod.LINEARIZED),
            dtype="float64", operator_path="tile", tile_resident=resident,
        )
        s = solver.NavierStokesSolver(cfg, mesh2d_path)
        _, hist = s.run(n_steps=6)
        assert all(h["converged"] for h in hist)
        res[resident] = np.array(
            [[h["Cd"], h["Cl"], h["DeltaP"], h["gmres_iters"]] for h in hist]
        )
    err = np.abs(res[True][:, :3] - res[False][:, :3]).max()
    scale = np.abs(res[False][:, :3]).max()
    assert err < 1e-8 * scale
    # Same Krylov trajectory => identical iteration counts.
    np.testing.assert_array_equal(res[True][:, 3], res[False][:, 3])


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


def test_rcb_and_morton_clusterings_agree(fixture_mesh_fe):
    # The clustering changes only WHICH elements share a tile (and hence
    # summation order); the operator action must agree to roundoff.
    mesh, fe = fixture_mesh_fe
    rng = np.random.default_rng(30)
    params = assembly.StepParams(
        dt=0.05, theta=0.6, nu=0.01, rho=1.0, gamma=0.1, use_supg=False
    )
    u_adv = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3)
    x = jnp.asarray(rng.normal(size=fe.n_dofs))
    dvv, cvv, avp, apv, _ = assembly.oseen_blocks(fe, params, u_adv, u_adv * 0.5)
    ys = {}
    un = {}
    for cl in ("rcb", "morton"):
        tiles = tile_operator.build_tile_arrays(mesh, fe, tile_e=16, cluster=cl)
        blk = tile_operator.build_tile_blocks(fe, tiles, dvv, cvv, avp, apv)
        ys[cl] = np.asarray(tile_operator.make_tile_operator(fe, tiles, blk)(x))
        un[cl] = tiles.un
    scale = np.abs(ys["morton"]).max()
    np.testing.assert_allclose(ys["rcb"], ys["morton"], atol=1e-11 * scale)
    # The point of RCB: never a wider slot pad than the curve order.
    assert un["rcb"] <= un["morton"], un
