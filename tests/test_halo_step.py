"""Full time loop on the halo layout == single-device solver.

HaloNavierStokesSolver runs assembly, the dt-retry ladder, preconditioned
FGMRES and the benchmark functionals entirely on the distributed owned-node
layout (parallel/halo_solver.py); different preconditioner evaluation
schedules agree to the Krylov solve tolerance, so the gates here are at
that level, not bitwise.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.config import NonlinearMethod
from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.parallel import halo_fe, halo_solver, sharding

N_DEV = 8


@pytest.fixture(scope="module")
def solvers(mesh2d_path):
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    cfg = dataclasses.replace(test_cases.make("2D-2", deltat=0.01), dtype="float64")
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    ref = solver.NavierStokesSolver(cfg, mesh)
    # mesh-2D.msh is graded around the cylinder: equal-count strips violate
    # the one-hop property, so this also exercises the geometric fallback.
    hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV)
    return ref, hs


def test_node_ownership_partitions_and_verts_are_consistent(solvers):
    _, hs = solvers
    hfe = hs.hfe
    nodes = np.asarray(hfe.owned_nodes)
    real = nodes[nodes < hfe.n_vnodes_glob]
    assert len(real) == hfe.n_vnodes_glob
    assert len(np.unique(real)) == hfe.n_vnodes_glob
    verts = np.asarray(hfe.owned_verts)
    vreal = verts[verts < hfe.n_p_glob]
    assert len(vreal) == hfe.n_p_glob
    assert len(np.unique(vreal)) == hfe.n_p_glob
    # A vertex is owned by the strip owning its velocity node.
    for s in range(hfe.n_shards):
        vs = set(verts[s][verts[s] < hfe.n_p_glob].tolist())
        ns = set(nodes[s][nodes[s] < hfe.n_p_glob].tolist())
        assert vs == ns


def test_scatter_gather_roundtrip(solvers):
    _, hs = solvers
    hfe = hs.hfe
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(hs.fe.n_dofs))
    x_loc = halo_fe.scatter_local(hfe, x)
    back = halo_fe.gather_local(hfe, x_loc)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=0, atol=0)


def test_full_steps_match_single_device(solvers):
    ref, hs = solvers
    s_ref = ref.initial_state()
    s_h = hs.initial_state()
    for i in range(3):
        s_ref, m_ref = ref.step(s_ref)
        s_h, m_h = hs.step(s_h)
        # Same preconditioner structure applied on two layouts: iteration
        # counts must coincide (the Krylov trajectories are identical up to
        # roundoff in the reductions).
        assert abs(int(m_h.gmres_iters) - int(m_ref.gmres_iters)) <= 2
        assert bool(m_h.converged)
        x_h = np.asarray(hs.global_solution(s_h))
        x_r = np.asarray(s_ref.x_old)
        scale = np.max(np.abs(x_r))
        assert np.max(np.abs(x_h - x_r)) < 5e-3 * scale
        assert abs(float(m_h.drag) - float(m_ref.drag)) < 1e-3
        assert abs(float(m_h.lift) - float(m_ref.lift)) < 1e-3
        assert abs(float(m_h.delta_p) - float(m_ref.delta_p)) < 1e-3


def test_newton_steps_match_single_device(mesh2d_path):
    """Halo-layout Newton (2D-1 preset) == single-device Newton trajectory."""
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    cfg = dataclasses.replace(test_cases.make("2D-1", deltat=0.1), dtype="float64")
    assert cfg.nonlinear_method == NonlinearMethod.NEWTON
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    ref = solver.NavierStokesSolver(cfg, mesh)
    hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV)
    s_ref = ref.initial_state()
    s_h = hs.initial_state()
    for i in range(2):
        s_ref, m_ref = ref.step(s_ref)
        s_h, m_h = hs.step(s_h)
        assert int(m_h.newton_iters) == int(m_ref.newton_iters)
        assert bool(m_h.converged) == bool(m_ref.converged)
        x_h = np.asarray(hs.global_solution(s_h))
        x_r = np.asarray(s_ref.x_old)
        scale = np.max(np.abs(x_r))
        assert np.max(np.abs(x_h - x_r)) < 5e-3 * scale
        assert abs(float(m_h.drag) - float(m_ref.drag)) < 1e-3
        assert abs(float(m_h.lift) - float(m_ref.lift)) < 1e-3
        assert abs(float(m_h.delta_p) - float(m_ref.delta_p)) < 1e-3


def _grid_partition(mesh, nx, ny):
    """Checkerboard (nx, ny) element partition — guaranteed multi-neighbor
    (up/down + left/right + corner adjacency), exercising the multi-round
    ppermute schedule that general partitions need."""
    cent = np.asarray(mesh.vertices)[np.asarray(mesh.elems_p1[: mesh.n_el_real])].mean(axis=1)
    lo = cent.min(axis=0)
    hi = cent.max(axis=0) + 1e-12
    bx = np.minimum(((cent[:, 0] - lo[0]) / (hi[0] - lo[0]) * nx).astype(int), nx - 1)
    by = np.minimum(((cent[:, 1] - lo[1]) / (hi[1] - lo[1]) * ny).astype(int), ny - 1)
    bins = bx * ny + by
    pads = np.arange(mesh.n_el_real, mesh.n_el)
    return [
        np.concatenate([np.where(bins == k)[0], pads[k :: nx * ny]])
        for k in range(nx * ny)
    ]


def test_full_steps_match_on_grid_partition(mesh2d_path):
    """4x2 checkerboard partition (multi-neighbor halo graph) == single
    device.  The comm schedule needs >1 ppermute round here."""
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    cfg = dataclasses.replace(test_cases.make("2D-2", deltat=0.01), dtype="float64")
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    strips = _grid_partition(mesh, 4, 2)
    ref = solver.NavierStokesSolver(cfg, mesh)
    hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV, strips=strips)
    assert hs.hfe.n_rounds > 1, "grid partition should need a multi-round schedule"
    s_ref = ref.initial_state()
    s_h = hs.initial_state()
    for i in range(2):
        s_ref, m_ref = ref.step(s_ref)
        s_h, m_h = hs.step(s_h)
        assert abs(int(m_h.gmres_iters) - int(m_ref.gmres_iters)) <= 2
        assert bool(m_h.converged)
        x_h = np.asarray(hs.global_solution(s_h))
        x_r = np.asarray(s_ref.x_old)
        scale = np.max(np.abs(x_r))
        assert np.max(np.abs(x_h - x_r)) < 5e-3 * scale
        assert abs(float(m_h.drag) - float(m_ref.drag)) < 1e-3
        assert abs(float(m_h.delta_p) - float(m_ref.delta_p)) < 1e-3


def test_full_steps_match_on_3d_rcb_partition():
    """RCB partition of a 3D tet mesh (multi-neighbor in general) == single
    device (reference partitions 3D meshes the same way, cpp:56-61)."""
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    from navier_stokes_equations_tpu.mesh import generators

    cfg = dataclasses.replace(test_cases.make("3D-2Z", deltat=0.01), dtype="float64")
    mesh = sharding.partition_mesh(
        taylor_hood.build(generators.channel_cylinder_3d(0.09, 0.05)), N_DEV
    )
    ref = solver.NavierStokesSolver(cfg, mesh)
    hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV)
    s_ref = ref.initial_state()
    s_h = hs.initial_state()
    s_ref, m_ref = ref.step(s_ref)
    s_h, m_h = hs.step(s_h)
    assert abs(int(m_h.gmres_iters) - int(m_ref.gmres_iters)) <= 2
    assert bool(m_h.converged)
    x_h = np.asarray(hs.global_solution(s_h))
    x_r = np.asarray(s_ref.x_old)
    scale = np.max(np.abs(x_r))
    assert np.max(np.abs(x_h - x_r)) < 5e-3 * scale
    assert abs(float(m_h.drag) - float(m_ref.drag)) < 2e-3


def test_halo_newton_host_driver_matches_graph(mesh2d_path):
    """Host-driven halo Newton == fully-jitted halo while_loop, bit-exact
    (same sequence of assemblies and solves, host vs lax control flow)."""
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    res = {}
    for drv in ("graph", "host"):
        cfg = dataclasses.replace(
            test_cases.make("2D-1", deltat=0.1), dtype="float64", newton_driver=drv
        )
        hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV)
        st = hs.initial_state()
        for _ in range(2):
            st, m = hs.step(st)
        res[drv] = (
            np.asarray(hs.global_solution(st)),
            m.newton_iters, m.gmres_iters, m.converged,
        )
    np.testing.assert_array_equal(res["graph"][0], res["host"][0])
    assert res["graph"][1:] == res["host"][1:]


def test_full_steps_match_single_device_defect_criterion(mesh2d_path):
    """The defect stopping criterion distributes over the halo layout (the
    extra ||b - A x0|| is one shard_mapped matvec + psum norm): per-step
    iteration counts and functionals must match the single-device solver."""
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    cfg = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01), dtype="float64",
        gmres_criterion="defect",
    )
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    ref = solver.NavierStokesSolver(cfg, mesh)
    hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV)
    s_ref = ref.initial_state()
    s_h = hs.initial_state()
    for _ in range(2):
        s_ref, m_ref = ref.step(s_ref)
        s_h, m_h = hs.step(s_h)
        assert int(m_ref.gmres_iters) > 0  # defect criterion never freezes
        assert abs(int(m_h.gmres_iters) - int(m_ref.gmres_iters)) <= 2
        assert bool(m_h.converged)
        assert abs(float(m_h.drag) - float(m_ref.drag)) < 1e-3
        assert abs(float(m_h.delta_p) - float(m_ref.delta_p)) < 1e-3
