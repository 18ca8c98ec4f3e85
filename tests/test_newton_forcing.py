"""Eisenstat-Walker inexact-Newton forcing (config.newton_forcing="ew").

Far from the root the Jacobian is a poor local model, so solving the inner
system to the fixed 1e-2 wastes Krylov iterations; EW choice 2 loosens the
tolerance early and tightens it as ||F|| falls.  Gates: the forcing-term
recurrence itself, outer convergence to the same state as fixed forcing,
and a strictly lower total Krylov count on the 2D-1 steady case (the
VERDICT round-2 perf rung).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.models import solver, test_cases


def _mk(mesh2d_path, **over):
    cfg = dataclasses.replace(
        test_cases.make("2D-1", deltat=0.1), dtype="float64", **over
    )
    return solver.NavierStokesSolver(cfg, mesh2d_path)


def test_ew_eta_recurrence(mesh2d_path):
    s = _mk(mesh2d_path, newton_forcing="ew")
    cfg = s.cfg
    # First iteration: eta_max regardless of residuals.
    assert float(s._ew_eta(1.0, jnp.inf, 0.5, 0, 1.0)) == cfg.newton_forcing_eta_max
    # Quadratic-ish progress loosens via the safeguard, clamped to eta_max.
    eta = float(s._ew_eta(0.5, 1.0, 0.5, 1, 1.0))
    assert eta == pytest.approx(
        max(0.9 * 0.25, 0.9 * 0.25), rel=1e-12
    )  # raw == safeguard here
    # Tiny residual ratio: floored by eta_min.
    eta = float(s._ew_eta(1e-6, 1.0, 0.01, 3, 1.0))
    assert eta >= cfg.newton_forcing_eta_min
    # Oversolving guard: never tighter than half the remaining decrease
    # to the outer stopping target (res0=1 -> target = newton_rtol).
    res = 1e-5
    eta = float(s._ew_eta(res, 1.0, 1e-4, 5, 1.0))
    assert eta == pytest.approx(0.5 * cfg.newton_rtol * 1.0 / res, rel=1e-12)


def test_ew_eta_tightens_on_non_descent(mesh2d_path):
    """Choice 2 alone LOOSENS on stagnation (res ~ prev -> eta ~ gamma ->
    clamped to eta_max) — the measured 3D-1Z@666k failure mode where every
    step's Newton stalled with eta pinned at 0.5.  When the residual fails
    the damping ladder's 0.9 descent test the forcing must tighten
    geometrically (0.1x) instead."""
    s = _mk(mesh2d_path, newton_forcing="ew")
    cfg = s.cfg
    # Stagnation: res barely below prev -> tighten, not gamma*(0.99)^2.
    assert float(s._ew_eta(0.99, 1.0, 0.5, 2, 1.0)) == pytest.approx(0.05)
    # Outright growth: same tightening.
    assert float(s._ew_eta(1.3, 1.0, 0.05, 3, 1.0)) == pytest.approx(0.005)
    # Repeated non-descent bottoms out at eta_min, never below.
    assert float(
        s._ew_eta(1.0, 1.0, 2 * cfg.newton_forcing_eta_min, 4, 1.0)
    ) == pytest.approx(cfg.newton_forcing_eta_min)
    # A genuinely descending step is untouched by the safeguard.
    assert float(s._ew_eta(0.5, 1.0, 0.5, 1, 1.0)) == pytest.approx(0.9 * 0.25)


@pytest.mark.parametrize("driver", ["graph", "host"])
def test_ew_converges_to_same_steady_state(mesh2d_path, driver):
    s_fix = _mk(mesh2d_path, newton_driver=driver)
    s_ew = _mk(mesh2d_path, newton_driver=driver, newton_forcing="ew")
    st_f, st_e = s_fix.initial_state(), s_ew.initial_state()
    tot_f = tot_e = 0
    for _ in range(3):
        st_f, m_f = s_fix.step(st_f)
        st_e, m_e = s_ew.step(st_e)
        assert bool(m_f.converged) and bool(m_e.converged)
        tot_f += int(m_f.gmres_iters)
        tot_e += int(m_e.gmres_iters)
        assert abs(float(m_e.drag) - float(m_f.drag)) < 1e-3
        assert abs(float(m_e.delta_p) - float(m_f.delta_p)) < 1e-4
    scale = float(jnp.max(jnp.abs(st_f.x_old))) + 1e-30
    assert float(jnp.max(jnp.abs(st_e.x_old - st_f.x_old))) < 5e-3 * scale
    # The point of the exercise: fewer total Krylov iterations.
    assert tot_e < tot_f, (tot_e, tot_f)


def test_ew_on_halo_layout(mesh2d_path):
    import jax

    from navier_stokes_equations_tpu.mesh import taylor_hood
    from navier_stokes_equations_tpu.parallel import halo_solver, sharding

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices (run under the CPU mesh conftest)")
    cfg = dataclasses.replace(
        test_cases.make("2D-1", deltat=0.1), dtype="float64",
        newton_forcing="ew",
    )
    mesh = sharding.partition_mesh(taylor_hood.load(mesh2d_path), 8)
    ref = solver.NavierStokesSolver(cfg, mesh)
    hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=8)
    s_r, s_h = ref.initial_state(), hs.initial_state()
    for _ in range(2):
        s_r, m_r = ref.step(s_r)
        s_h, m_h = hs.step(s_h)
        assert int(m_h.newton_iters) == int(m_r.newton_iters)
        assert bool(m_h.converged) == bool(m_r.converged)
        assert abs(float(m_h.drag) - float(m_r.drag)) < 1e-3


@pytest.mark.parametrize("driver", ["graph", "host"])
def test_jacobian_reuse_converges_to_same_steady_state(mesh2d_path, driver):
    """newton_jacobian_reuse=k freezes the Jacobian/preconditioner for k-1
    iterations (modified Newton, tile path).  The residual and stopping
    test stay exact, so the converged state must match the every-iteration
    rebuild to the outer tolerance; the frozen-Jacobian iteration may take
    MORE Newton iterations, never a wrong answer."""
    s_ref = _mk(mesh2d_path, newton_driver=driver,
                operator_path="tile", tile_elements=8)
    s_ru = _mk(mesh2d_path, newton_driver=driver,
               operator_path="tile", tile_elements=8,
               newton_jacobian_reuse=3)
    st_r, st_u = s_ref.initial_state(), s_ru.initial_state()
    for _ in range(3):
        st_r, m_r = s_ref.step(st_r)
        st_u, m_u = s_ru.step(st_u)
        assert bool(m_r.converged) and bool(m_u.converged)
        assert abs(float(m_u.drag) - float(m_r.drag)) < 1e-3
        assert abs(float(m_u.delta_p) - float(m_r.delta_p)) < 1e-4
    scale = float(jnp.max(jnp.abs(st_r.x_old))) + 1e-30
    assert float(jnp.max(jnp.abs(st_u.x_old - st_r.x_old))) < 5e-3 * scale


def test_jacobian_reuse_noop_on_quadrature_path(mesh2d_path):
    """On the quadrature path the knob is ignored (documented no-op)."""
    s = _mk(mesh2d_path, newton_jacobian_reuse=4)
    st = s.initial_state()
    st, m = s.step(st)
    assert bool(m.converged)
