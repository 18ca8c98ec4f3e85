"""Tile operator path on the halo layout (parallel/halo_tiles.py).

The per-strip tile reductions partition the global element sum, so after
the halo export the distributed tile matvec equals the quadrature-path
matvec EXACTLY (same element blocks, exact one-hot reductions, only the
accumulation order differs) — those gates are machine-precision.  The full
time loop is gated at the Krylov solve tolerance against the single-chip
tile solver, like tests/test_halo_step.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.config import NonlinearMethod
from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.ops import assembly
from navier_stokes_equations_tpu.parallel import halo_fe, halo_solver, sharding

N_DEV = 8


def _cfg(op):
    return dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01),
        dtype="float64",
        operator_path=op,
        tile_resident=False,
    )


@pytest.fixture(scope="module")
def solvers(mesh2d_path):
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    ref = solver.NavierStokesSolver(_cfg("tile"), mesh)
    ht = halo_solver.HaloNavierStokesSolver(_cfg("tile"), mesh, n_shards=N_DEV)
    hq = halo_solver.HaloNavierStokesSolver(_cfg("quadrature"), mesh, n_shards=N_DEV)
    return ref, ht, hq


def test_tile_resident_rejected_on_halo(mesh2d_path):
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    cfg = dataclasses.replace(_cfg("tile"), tile_resident=True)
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    with pytest.raises(NotImplementedError):
        halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV)


def test_builder_covers_all_real_nodes(solvers):
    """Every element of every strip got a tile slot for each of its nodes."""
    _, ht, _ = solvers
    tiles = ht.htiles.tiles
    hfe = ht.hfe
    e2l = np.asarray(hfe.fe_stack.elems_p2)
    tn = np.asarray(tiles.tile_nodes)
    tv = np.asarray(ht.htiles.tile_verts)
    for s in range(hfe.n_shards):
        touched = np.unique(e2l[s])
        in_tiles = np.unique(tn[s])
        assert set(touched.tolist()) <= set(in_tiles.tolist())
        # Pressure slots are the un_p prefix and carry valid vertex ids.
        assert tv[s].max() <= hfe.n_lp
        live = tn[s][:, : tiles.un_p] < hfe.n_ln
        assert (tv[s][live] < hfe.n_lp).all()


def _random_assembled(ht, hq, seed=0):
    """One assembly pass on both halo solvers from the same random state."""
    hfe = ht.hfe
    rng = np.random.default_rng(seed)
    sg = jnp.asarray(rng.standard_normal(ht.fe.n_dofs)) * 0.1
    s2 = halo_fe.scatter_local(hfe, sg).reshape(-1)
    state = dataclasses.replace(
        ht.initial_state(), x_old=s2, x_old_old=jnp.array(s2, copy=True)
    )
    params = assembly.StepParams(
        dt=jnp.asarray(0.01), theta=jnp.asarray(0.5), nu=jnp.asarray(ht.nu),
        rho=ht.cfg.rho, gamma=ht.cfg.grad_div_gamma, use_supg=ht.cfg.use_supg,
    )
    t_new = jnp.asarray(0.01)
    first = jnp.asarray(True)
    out_t = ht._assemble_halo(hfe, ht.htiles, params, state, t_new, first)
    out_q = hq._assemble_halo(hq.hfe, None, params, state, t_new, first)
    x2 = halo_fe.scatter_local(hfe, jnp.asarray(rng.standard_normal(ht.fe.n_dofs)))
    return params, out_t, out_q, x2


def test_matvec_matches_quadrature_exactly(solvers):
    """Same element sum, different association order: machine precision."""
    _, ht, hq = solvers
    params, (b_t, _, tab_t, blocks), (b_q, _, tab_q, _), x2 = _random_assembled(ht, hq)
    np.testing.assert_allclose(np.asarray(b_t), np.asarray(b_q), rtol=0, atol=0)
    ap_t = ht._make_matvec(
        ht.hfe, ht.statics, params, tab_t, htiles=ht.htiles, blocks=blocks
    )
    ap_q = hq._make_matvec(hq.hfe, hq.statics, params, tab_q)
    y_t = np.asarray(ap_t(x2.reshape(-1)))
    y_q = np.asarray(ap_q(x2.reshape(-1)))
    assert np.linalg.norm(y_t - y_q) < 1e-12 * np.linalg.norm(y_q)


def test_divergence_and_velocity_block_match(solvers):
    _, ht, hq = solvers
    params, (_, _, tab_t, blocks), (_, _, tab_q, _), x2 = _random_assembled(ht, hq)
    hfe = ht.hfe
    z2 = jnp.where(ht.statics.mask, 0.0, x2).at[:, hfe.dim * hfe.n_ln :].set(0.0)
    dv_t = np.asarray(
        ht._make_div_apply(hfe, params, htiles=ht.htiles, blocks=blocks)(z2)
    )
    dv_q = np.asarray(hq._make_div_apply(hq.hfe, params)(z2))
    assert np.linalg.norm(dv_t - dv_q) < 1e-12 * np.linalg.norm(dv_q)
    vl_t = ht._make_vel_apply(
        hfe, ht.statics, params, tab_t, htiles=ht.htiles, blocks=blocks
    )
    vl_q = hq._make_vel_apply(hq.hfe, hq.statics, params, tab_q)
    y_t = np.asarray(vl_t(x2.reshape(-1)))
    y_q = np.asarray(vl_q(x2.reshape(-1)))
    assert np.linalg.norm(y_t - y_q) < 1e-12 * np.linalg.norm(y_q)


def test_full_steps_match_single_chip_tile(solvers):
    """3 time steps: halo tile == single-chip tile (same preconditioner
    structure => iteration counts coincide; states to the solve tol)."""
    ref, ht, _ = solvers
    s_ref = ref.initial_state()
    s_h = ht.initial_state()
    for _ in range(3):
        s_ref, m_ref = ref.step(s_ref)
        s_h, m_h = ht.step(s_h)
        assert abs(int(m_h.gmres_iters) - int(m_ref.gmres_iters)) <= 2
        assert bool(m_h.converged)
        x_h = np.asarray(ht.global_solution(s_h))
        x_r = np.asarray(s_ref.x_old)
        scale = np.max(np.abs(x_r))
        assert np.max(np.abs(x_h - x_r)) < 5e-3 * scale
        assert abs(float(m_h.drag) - float(m_ref.drag)) < 1e-3
        assert abs(float(m_h.lift) - float(m_ref.lift)) < 1e-3
        assert abs(float(m_h.delta_p) - float(m_ref.delta_p)) < 1e-3


def test_supg_matvec_matches_quadrature(mesh2d_path):
    """use_supg=True routes the halo tile build through the generic
    oseen_blocks reduction inside shard_map; the matvec must still equal
    the quadrature kernels exactly."""
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    cfg_t = dataclasses.replace(_cfg("tile"), use_supg=True, grad_div_gamma=0.1)
    cfg_q = dataclasses.replace(cfg_t, operator_path="quadrature")
    ht = halo_solver.HaloNavierStokesSolver(cfg_t, mesh, n_shards=N_DEV)
    hq = halo_solver.HaloNavierStokesSolver(cfg_q, mesh, n_shards=N_DEV)
    assert ht.htiles.tiles.statics is None  # generic build path
    params, (b_t, _, tab_t, blocks), (b_q, _, tab_q, _), x2 = _random_assembled(ht, hq)
    np.testing.assert_allclose(np.asarray(b_t), np.asarray(b_q), rtol=0, atol=0)
    ap_t = ht._make_matvec(
        ht.hfe, ht.statics, params, tab_t, htiles=ht.htiles, blocks=blocks
    )
    ap_q = hq._make_matvec(hq.hfe, hq.statics, params, tab_q)
    y_t = np.asarray(ap_t(x2.reshape(-1)))
    y_q = np.asarray(ap_q(x2.reshape(-1)))
    assert np.linalg.norm(y_t - y_q) < 1e-12 * np.linalg.norm(y_q)


def test_halo_jacobian_reuse_same_steady_state(mesh2d_path):
    """newton_jacobian_reuse=k on the halo host driver (tile path) freezes
    the per-strip tile blocks / diagonal / tables for k-1 iterations while
    the outer stopping test sees the TRUE residual — the distributed
    mirror of the single-chip modified Newton (PARITY.md #10)."""
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")

    def mk(**kw):
        cfg = dataclasses.replace(
            test_cases.make("2D-1", deltat=0.1), dtype="float64",
            operator_path="tile", tile_resident=False,
            newton_driver="host", **kw,
        )
        mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
        return halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV)

    s_ref, s_ru = mk(), mk(newton_jacobian_reuse=3)
    st_r, st_u = s_ref.initial_state(), s_ru.initial_state()
    for _ in range(2):
        st_r, m_r = s_ref.step(st_r)
        st_u, m_u = s_ru.step(st_u)
        assert bool(m_r.converged) and bool(m_u.converged)
        assert abs(float(m_u.drag) - float(m_r.drag)) < 1e-3
        assert abs(float(m_u.delta_p) - float(m_r.delta_p)) < 1e-4
    x_r = np.asarray(s_ref.global_solution(st_r))
    x_u = np.asarray(s_ru.global_solution(st_u))
    scale = np.max(np.abs(x_r)) + 1e-30
    assert np.max(np.abs(x_u - x_r)) < 5e-3 * scale


def test_newton_tile_steps_match_single_chip(mesh2d_path):
    """Halo Newton on the tile path (Jacobian reduced to tile matrices once
    per iteration) == single-chip Newton tile trajectory (2D-1 preset)."""
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    cfg = dataclasses.replace(
        test_cases.make("2D-1", deltat=0.1), dtype="float64",
        operator_path="tile", tile_resident=False,
    )
    assert cfg.nonlinear_method == NonlinearMethod.NEWTON
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    ref = solver.NavierStokesSolver(cfg, mesh)
    hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV)
    s_ref = ref.initial_state()
    s_h = hs.initial_state()
    for _ in range(2):
        s_ref, m_ref = ref.step(s_ref)
        s_h, m_h = hs.step(s_h)
        assert int(m_h.newton_iters) == int(m_ref.newton_iters)
        assert bool(m_h.converged) == bool(m_ref.converged)
        x_h = np.asarray(hs.global_solution(s_h))
        x_r = np.asarray(s_ref.x_old)
        scale = np.max(np.abs(x_r))
        assert np.max(np.abs(x_h - x_r)) < 5e-3 * scale
        assert abs(float(m_h.drag) - float(m_ref.drag)) < 1e-3
