"""Pseudo-transient Δt continuation (steady cases) vs the fixed-dt march.

The reference solves its steady benchmarks by marching a fixed dt=0.1 BE
ladder for T/dt steps (NavierStokes.cpp:1044-1076); continuation grows dt
geometrically after every converged Newton step
(solver.run_steady_continuation) and must reach the SAME fixed point in
far fewer steps.
"""

import dataclasses

import pytest

from navier_stokes_equations_tpu.models import solver, test_cases


@pytest.fixture(scope="module")
def continuation_2d1(mesh2d_path):
    cfg = test_cases.make("2D-1")
    cfg = dataclasses.replace(cfg, dtype="float64")
    s = solver.NavierStokesSolver(cfg, mesh2d_path)
    state, hist = s.run_steady_continuation()
    return s, state, hist


def test_continuation_reaches_steady_state(continuation_2d1):
    _, _, hist = continuation_2d1
    assert hist, "continuation produced no accepted steps"
    last = hist[-1]
    assert last["converged"]
    # The steady detector actually fired (not the step budget).
    assert last["steady_rate"] < 1e-5
    # DFG 2D-1 coarse-mesh gates (same as the fixed-march test).
    assert 5.45 < last["Cd"] < 5.70
    assert abs(last["Cl"]) < 0.05
    assert 0.110 < last["DeltaP"] < 0.125


def test_continuation_is_fewer_steps(continuation_2d1):
    """The whole point: ~log2(dt_max/dt0) accepted steps, not T/dt."""
    _, _, hist = continuation_2d1
    assert len(hist) <= 25  # fixed march: 50 steps to t=5, 100 to T=10
    # dt actually grew along the ladder.
    assert hist[-1]["dt"] > 4 * hist[0]["dt"]


def test_continuation_matches_fixed_march(continuation_2d1, mesh2d_path):
    """Same fixed point as the reference-style fixed-dt march."""
    s, _, hist = continuation_2d1
    cfg = test_cases.make("2D-1")
    cfg = dataclasses.replace(cfg, dtype="float64")
    s2 = solver.NavierStokesSolver(cfg, mesh2d_path)
    _, hist2 = s2.run(n_steps=50)  # t=5, well past the 1 s ramp
    assert abs(hist[-1]["Cd"] - hist2[-1]["Cd"]) < 5e-3
    assert abs(hist[-1]["DeltaP"] - hist2[-1]["DeltaP"]) < 5e-4


def test_gd_mass_tristate_resolution():
    from navier_stokes_equations_tpu import config as config_mod

    cfg = test_cases.make("2D-1")
    assert cfg.schur_gd_mass is None and not cfg.schur_gd_mass_on()
    assert dataclasses.replace(cfg, steady_continuation=True).schur_gd_mass_on()
    assert dataclasses.replace(cfg, schur_gd_mass=True).schur_gd_mass_on()
    assert not dataclasses.replace(
        cfg, steady_continuation=True, schur_gd_mass=False
    ).schur_gd_mass_on()


def test_continuation_gd_mass_auto_wins(continuation_2d1, mesh2d_path):
    """schur_gd_mass=None resolves ON under continuation (the grad-div
    Schur mass term, measured 2.2x fewer Krylov its on this ladder);
    forcing it off must reach the SAME fixed point with more work."""
    _, _, hist = continuation_2d1  # auto -> on
    cfg = test_cases.make("2D-1")
    cfg = dataclasses.replace(cfg, dtype="float64", schur_gd_mass=False)
    s2 = solver.NavierStokesSolver(cfg, mesh2d_path)
    _, hist2 = s2.run_steady_continuation()
    assert abs(hist[-1]["Cd"] - hist2[-1]["Cd"]) < 5e-3
    assert abs(hist[-1]["DeltaP"] - hist2[-1]["DeltaP"]) < 5e-4
    its_on = sum(h["gmres_iters"] for h in hist)
    its_off = sum(h["gmres_iters"] for h in hist2)
    assert its_on < 0.75 * its_off, (its_on, its_off)


def test_continuation_rejects_non_newton(mesh2d_path):
    from navier_stokes_equations_tpu.config import NonlinearMethod

    cfg = test_cases.make("2D-2")
    cfg = dataclasses.replace(cfg, dtype="float64")
    s = solver.NavierStokesSolver(cfg, mesh2d_path)
    assert cfg.nonlinear_method == NonlinearMethod.LINEARIZED
    with pytest.raises(NotImplementedError):
        s.run_steady_continuation()
