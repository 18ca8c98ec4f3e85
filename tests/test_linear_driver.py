"""Host-segmented linearized Krylov == fused attempt trajectories.

config.linear_driver="host" splits each ladder trial's FGMRES into
gmres_segment_its-iteration jitted segments (a segment boundary is a GMRES
restart) so no device call packs minutes of Krylov work — the bound that
saved the 1.36M-dof defect-criterion run from the TPU worker watchdog.
With a segment length the solve never exceeds, the trajectory must be
IDENTICAL to the fused attempt (same Arnoldi process, same tolerance);
with a tiny segment it restarts more often but must land on the same
physics at the solve tolerance.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases


@pytest.fixture(scope="module")
def mesh(mesh2d_path):
    return taylor_hood.load(mesh2d_path)


@pytest.mark.parametrize("operator_path", ["quadrature", "tile"])
def test_segmented_matches_fused(mesh, operator_path):
    base = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01), dtype="float64",
        operator_path=operator_path,
    )
    fused = solver.NavierStokesSolver(base, mesh)
    seg = solver.NavierStokesSolver(
        dataclasses.replace(base, linear_driver="host", gmres_segment_its=64),
        mesh,
    )
    assert seg._linear_host and not fused._linear_host
    s0, s1 = fused.initial_state(), seg.initial_state()
    for _ in range(3):
        s0, m0 = fused.step(s0)
        s1, m1 = seg.step(s1)
        # Solve never exceeds one segment -> identical Arnoldi + tolerance.
        assert int(m1.gmres_iters) == int(m0.gmres_iters)
        assert bool(m1.converged) == bool(m0.converged)
        np.testing.assert_allclose(
            np.asarray(s1.x_old), np.asarray(s0.x_old), rtol=0, atol=1e-11
        )


def test_tiny_segments_same_physics(mesh):
    """Forced mid-solve restarts (segment < iteration count) still land on
    the same state at the solve tolerance — restarted GMRES semantics."""
    base = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01), dtype="float64",
    )
    fused = solver.NavierStokesSolver(base, mesh)
    seg = solver.NavierStokesSolver(
        dataclasses.replace(base, linear_driver="host", gmres_segment_its=3),
        mesh,
    )
    s0, s1 = fused.initial_state(), seg.initial_state()
    for _ in range(2):
        s0, m0 = fused.step(s0)
        s1, m1 = seg.step(s1)
        assert bool(m1.converged)
        scale = float(jnp.max(jnp.abs(s0.x_old))) + 1e-30
        assert float(jnp.max(jnp.abs(s1.x_old - s0.x_old))) < 5e-3 * scale
        assert abs(float(m1.drag) - float(m0.drag)) < 1e-3


def test_defect_criterion_segmented(mesh):
    """The defect tolerance is computed ONCE per trial (segment restarts
    must not relax it): segmented defect == fused defect trajectory."""
    base = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01), dtype="float64",
        gmres_criterion="defect",
    )
    fused = solver.NavierStokesSolver(base, mesh)
    seg = solver.NavierStokesSolver(
        dataclasses.replace(base, linear_driver="host", gmres_segment_its=64),
        mesh,
    )
    s0, s1 = fused.initial_state(), seg.initial_state()
    for _ in range(2):
        s0, m0 = fused.step(s0)
        s1, m1 = seg.step(s1)
        assert int(m1.gmres_iters) == int(m0.gmres_iters)
        np.testing.assert_allclose(
            np.asarray(s1.x_old), np.asarray(s0.x_old), rtol=0, atol=1e-11
        )


def test_segmented_supg_3d_matches_fused():
    """SUPG quadrature path (the mesh-3D-xfine configuration class): the
    packed advection tables include tau — the segment unpack must thread
    it through identically."""
    from navier_stokes_equations_tpu.mesh import generators

    mesh3 = taylor_hood.build(generators.channel_cylinder_3d(0.14, 0.06))
    base = dataclasses.replace(
        test_cases.make("3D-2Z", deltat=0.01), dtype="float64",
    )
    assert base.use_supg
    fused = solver.NavierStokesSolver(base, mesh3)
    seg = solver.NavierStokesSolver(
        dataclasses.replace(base, linear_driver="host", gmres_segment_its=64),
        mesh3,
    )
    s0, s1 = fused.initial_state(), seg.initial_state()
    for _ in range(2):
        s0, m0 = fused.step(s0)
        s1, m1 = seg.step(s1)
        assert int(m1.gmres_iters) == int(m0.gmres_iters)
        np.testing.assert_allclose(
            np.asarray(s1.x_old), np.asarray(s0.x_old), rtol=0, atol=1e-11
        )
