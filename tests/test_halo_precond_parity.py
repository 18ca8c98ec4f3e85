"""Halo-layout preconditioner variants == single-device trajectories.

Round-2 left the halo layout with only jacobi/p1coarse* velocity smoothers,
the CC Schur action and the triangular structure (PARITY.md #8).  These
gates assert the newly-distributed options — Chebyshev velocity smoothing,
per-node block inverses, the PCD Schur action, and the block-diagonal
structure (reference: NavierStokes.hpp:242-277) — reproduce the nodal
solver's trajectory and iteration counts on an 8-device CPU mesh.
"""

import dataclasses

import jax
import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.parallel import halo_solver, sharding

N_DEV = 8

VARIANTS = {
    "chebyshev": dict(precond_vel_method="chebyshev"),
    "nodeblock": dict(precond_vel_method="nodeblock"),
    "pcd": dict(precond_schur="pcd"),
    "diagonal": dict(precond_structure="diagonal"),
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_halo_variant_matches_single_device(mesh2d_path, name):
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    over = VARIANTS[name]
    cfg = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01), dtype="float64", **over
    )
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    ref = solver.NavierStokesSolver(cfg, mesh)
    hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV)
    s_ref = ref.initial_state()
    s_h = hs.initial_state()
    for _ in range(2):
        s_ref, m_ref = ref.step(s_ref)
        s_h, m_h = hs.step(s_h)
        # Same preconditioner on two layouts: iteration counts coincide up
        # to reduction roundoff.
        assert abs(int(m_h.gmres_iters) - int(m_ref.gmres_iters)) <= 2
        assert bool(m_h.converged) == bool(m_ref.converged)
        x_h = np.asarray(hs.global_solution(s_h))
        x_r = np.asarray(s_ref.x_old)
        scale = np.max(np.abs(x_r))
        assert np.max(np.abs(x_h - x_r)) < 5e-3 * scale
        assert abs(float(m_h.drag) - float(m_ref.drag)) < 1e-3


def test_halo_newton_nodeblock_matches_single_device(mesh2d_path):
    """Newton path (2D-1) with the nodeblock smoother on the halo layout."""
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices (run under the CPU mesh conftest)")
    cfg = dataclasses.replace(
        test_cases.make("2D-1", deltat=0.1),
        dtype="float64",
        precond_vel_method="nodeblock",
    )
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), N_DEV)
    ref = solver.NavierStokesSolver(cfg, mesh)
    hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=N_DEV)
    s_ref, m_ref = ref.step(ref.initial_state())
    s_h, m_h = hs.step(hs.initial_state())
    assert int(m_h.newton_iters) == int(m_ref.newton_iters)
    assert bool(m_h.converged) == bool(m_ref.converged)
    x_h = np.asarray(hs.global_solution(s_h))
    x_r = np.asarray(s_ref.x_old)
    assert np.max(np.abs(x_h - x_r)) < 5e-3 * np.max(np.abs(x_r))
