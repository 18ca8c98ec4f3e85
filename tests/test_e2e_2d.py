"""End-to-end physics gates on the 2D benchmark cases (coarse mesh, f64 CPU).

Gate values are the Schaefer-Turek / DFG references with coarse-mesh slack:
  2D-1 steady:  Cd ~ 5.58, Cl ~ 0.0106, dP ~ 0.1175  (lit. corridor)
  2D-2 at t=8:  Cd_max in [3.22, 3.24], Cl_max ~ 1.0, St in [0.295, 0.305],
                dP in [2.46, 2.50] on fine meshes; the 888-node mesh lands
                within a few % below (validated against the corridor trend).
"""

import dataclasses

import numpy as np
import pytest

from navier_stokes_equations_tpu.models import solver, test_cases


def _make_solver(case, mesh_path, **over):
    cfg = test_cases.make(case, **over.pop("case_kwargs", {}))
    cfg = dataclasses.replace(cfg, dtype="float64", **over)
    return solver.NavierStokesSolver(cfg, mesh_path)


@pytest.fixture(scope="module")
def steady_2d1(mesh2d_path):
    s = _make_solver("2D-1", mesh2d_path)
    state, hist = s.run(n_steps=50)  # t = 5: well past the 1 s ramp
    return s, state, hist


def test_2d1_steady_drag(steady_2d1):
    _, _, hist = steady_2d1
    last = hist[-1]
    assert last["converged"]
    # DFG 2D-1: Cd in [5.57, 5.59] on fine meshes; coarse-mesh slack ~1%.
    assert 5.45 < last["Cd"] < 5.70
    assert abs(last["Cl"]) < 0.05
    assert 0.110 < last["DeltaP"] < 0.125
    # Steady: last two steps agree tightly.
    assert abs(hist[-1]["Cd"] - hist[-2]["Cd"]) < 1e-3


def test_2d1_newton_converges_every_step(steady_2d1):
    _, _, hist = steady_2d1
    assert all(h["converged"] for h in hist)
    assert all(h["newton_iters"] <= 10 for h in hist[5:])


def test_2d2_shedding_physics(mesh2d_path):
    """Full 2D-2 at dt=0.01 to t=8: vortex shedding, St and Cd gates."""
    s = _make_solver("2D-2", mesh2d_path, case_kwargs=dict(deltat=0.01))
    state, hist = s.run(n_steps=800)
    t = np.array([h["time"] for h in hist])
    cd = np.array([h["Cd"] for h in hist])
    cl = np.array([h["Cl"] for h in hist])
    dp = np.array([h["DeltaP"] for h in hist])
    assert np.isfinite(cd).all() and np.isfinite(cl).all()

    sel = t > 5.0
    # Developed shedding: significant lift oscillation.
    assert cl[sel].max() > 0.5 and cl[sel].min() < -0.5
    # Coarse-mesh drag lands a few % under the corridor [3.22, 3.24].
    assert 3.0 < cd[sel].mean() < 3.35
    assert 3.05 < cd[sel].max() < 3.40
    # Strouhal from lift zero upcrossings.
    clf, tf = cl[sel], t[sel]
    zc = np.where(np.diff(np.sign(clf)) > 0)[0]
    assert len(zc) >= 2
    period = (tf[zc[-1]] - tf[zc[0]]) / (len(zc) - 1)
    St = 0.1 / period  # f D / U_mean with U_mean = 1.0
    assert 0.28 < St < 0.32
    # Pressure drop at t=8 near the corridor [2.46, 2.50].
    assert 2.2 < dp[-1] < 2.7


def test_2d1_linearized_matches_newton(mesh2d_path):
    """Same case through the other nonlinear path: consistent physics."""
    from navier_stokes_equations_tpu.config import NonlinearMethod

    s_lin = _make_solver(
        "2D-1", mesh2d_path, case_kwargs=dict(nm=NonlinearMethod.LINEARIZED)
    )
    _, hist = s_lin.run(n_steps=50)
    # Semi-implicit vs Newton differ by O(dt) during transients but agree at
    # the steady state.
    assert 5.45 < hist[-1]["Cd"] < 5.70
    assert 0.110 < hist[-1]["DeltaP"] < 0.125


def test_f32_matches_f64_short(mesh2d_path):
    """TPU-precision (f32) run tracks f64 on a short horizon."""
    res = {}
    for dt in ("float64", "float32"):
        cfg = dataclasses.replace(test_cases.make("2D-1"), dtype=dt)
        s = solver.NavierStokesSolver(cfg, mesh2d_path)
        _, hist = s.run(n_steps=10)
        res[dt] = np.array([[h["Cd"], h["Cl"], h["DeltaP"]] for h in hist])
    err = np.abs(res["float32"] - res["float64"]).max()
    scale = np.abs(res["float64"]).max()
    assert err < 2e-3 * scale


def test_2d3_time_varying_inlet(mesh2d_path):
    """2D-3: sin(pi t/8) inlet — Re(t) ramps, functionals track it."""
    s = _make_solver("2D-3", mesh2d_path, case_kwargs=dict(deltat=0.02))
    state, hist = s.run(n_steps=100)  # t = 2: Re rising toward ~70
    cd = np.array([h["Cd"] for h in hist])
    t = np.array([h["time"] for h in hist])
    assert np.isfinite(cd).all()
    assert all(h["converged"] for h in hist)
    # Drag rises with the accelerating inlet (ignoring the initial
    # added-mass transient).
    assert cd[-1] > cd[25]
    # Instantaneous-Re log parity field present for this case.
    assert "re_instant" in hist[-1]
    import math

    want = (2.0 / 3.0) * 1.5 * math.sin(math.pi * t[-1] / 8.0) * 0.1 / s.nu
    assert hist[-1]["re_instant"] == pytest.approx(want, rel=1e-9)


def test_newton_host_driver_matches_graph(mesh2d_path):
    """Host-driven Newton loop == fully-jitted while_loop, bit-exact."""
    import dataclasses

    import numpy as np

    from navier_stokes_equations_tpu.models import solver, test_cases

    res = {}
    for drv in ("graph", "host"):
        cfg = dataclasses.replace(
            test_cases.make("2D-1", deltat=0.1), dtype="float64", newton_driver=drv
        )
        s = solver.NavierStokesSolver(cfg, mesh2d_path)
        st = s.initial_state()
        for _ in range(2):
            st, m = s.step(st)
        res[drv] = (np.asarray(st.x_old), m.newton_iters, m.gmres_iters, m.converged)
    np.testing.assert_array_equal(res["graph"][0], res["host"][0])
    assert res["graph"][1:] == res["host"][1:]


@pytest.mark.parametrize("drv", ["graph", "host"])
def test_newton_reports_nonconvergence_when_crippled(mesh2d_path, drv):
    """A Newton iteration that cannot make progress must NOT claim
    convergence (reference prints every residual and never fakes it,
    NavierStokes.cpp:1155-1169).  Crippling the inner solver (1 Krylov
    iteration at an unreachable tolerance) stalls the damping ladder far
    above the roundoff floor -> converged=False."""
    cfg = dataclasses.replace(
        test_cases.make("2D-1", deltat=0.1),
        dtype="float64",
        newton_driver=drv,
        gmres_maxiter_newton=1,
        gmres_alloc=2,
        gmres_rtol_newton=1e-14,
        newton_max_iterations=6,
    )
    s = solver.NavierStokesSolver(cfg, mesh2d_path)
    st, m = s.step(s.initial_state())
    assert not m.converged
    assert m.residual > 1e-6  # genuinely far from converged


def test_newton_stall_at_floor_still_converges(mesh2d_path):
    """The f32 path legitimately stalls AT the assembly roundoff floor;
    the honest stall exit must still report converged there (otherwise
    every f32 steady run would be flagged)."""
    cfg = dataclasses.replace(
        test_cases.make("2D-1", deltat=0.1),
        dtype="float32",
        newton_tolerance=1e-30,  # unreachable: force the stall exit
        newton_rtol=1e-30,
    )
    s = solver.NavierStokesSolver(cfg, mesh2d_path)
    st = s.initial_state()
    for _ in range(3):
        st, m = s.step(st)
    assert m.converged


def test_freeze_guard_warns_on_zero_iteration_streak(mesh2d_path, capsys):
    """A huge rtol makes every warm-started solve accept at 0 iterations —
    the guard must flag the frozen trajectory (the mesh-3D-xfine failure
    mode, docs/DESIGN.md 'accuracy cliff')."""
    s = _make_solver("2D-2", mesh2d_path, gmres_rtol=10.0)
    _, hist = s.run(n_steps=6)
    assert all(h["gmres_iters"] == 0 for h in hist[1:])
    out = capsys.readouterr().out
    assert "consecutive 0-iteration" in out


def test_defect_criterion_never_freezes(mesh2d_path):
    """criterion='defect' keeps solving where the rhs criterion freezes:
    at rtol=10 'rhs' accepts the warm start at 0 iterations every step
    (see the freeze-guard test) — with 'defect' the 1e-6*||b|| floor plus
    the per-step defect normalization force real solves whenever the step
    has a defect above the floor."""
    s = _make_solver("2D-2", mesh2d_path, gmres_rtol=1e-4,
                     gmres_criterion="defect")
    _, hist = s.run(n_steps=8)
    assert all(h["gmres_iters"] > 0 for h in hist)
    assert all(h["converged"] for h in hist)


def test_defect_criterion_matches_rhs_at_tight_rtol(mesh2d_path):
    """At rtol=1e-8 both normalizations solve to the same accuracy class —
    trajectories must agree to solver-tolerance leftovers."""
    sa = _make_solver("2D-2", mesh2d_path, gmres_rtol=1e-8)
    sb = _make_solver("2D-2", mesh2d_path, gmres_rtol=1e-8,
                      gmres_criterion="defect")
    _, ha = sa.run(n_steps=8)
    _, hb = sb.run(n_steps=8)
    # The defect path's 1e-6*||b|| floor dominates at rtol=1e-8, so both
    # solve to <=1e-6*||b|| backward error — functionals agree at the
    # 1e-7-absolute level (measured 2e-8); a criterion bug diverges at 1e-2+.
    for a, b in zip(ha, hb):
        assert abs(a["Cd"] - b["Cd"]) <= 1e-6 + 1e-5 * abs(a["Cd"])
        assert abs(a["DeltaP"] - b["DeltaP"]) <= 1e-6 + 1e-5 * abs(a["DeltaP"])


def test_gmres_criterion_auto_switch(mesh2d_path, monkeypatch):
    """gmres_criterion='auto' (the default) resolves to 'rhs' below the dof
    threshold and 'defect' above it — the scale-safety guard that makes a
    default-config fine-mesh run unable to freeze (VERDICT r2 item 4;
    reference zero-guess SolverControl semantics: NavierStokes.cpp:836)."""
    from navier_stokes_equations_tpu import config as _config

    assert _config.resolve_gmres_criterion("auto", 10_000) == "rhs"
    assert _config.resolve_gmres_criterion(
        "auto", _config.GMRES_CRITERION_AUTO_DOFS + 1
    ) == "defect"
    assert _config.resolve_gmres_criterion("rhs", 10**9) == "rhs"
    assert _config.resolve_gmres_criterion("defect", 1) == "defect"

    # Default config on the small mesh: stays on the validated 'rhs'.
    s = _make_solver("2D-2", mesh2d_path)
    assert s.cfg.gmres_criterion == "auto"
    assert s._gmres_criterion == "rhs"

    # Same config above the (monkeypatched) threshold: auto-selects defect
    # and the solver genuinely iterates (the defect normalization demands a
    # per-step reduction of whatever defect the step has).
    monkeypatch.setattr(_config, "GMRES_CRITERION_AUTO_DOFS", 100)
    s2 = _make_solver("2D-2", mesh2d_path)
    assert s2._gmres_criterion == "defect"
    _, hist = s2.run(n_steps=4)
    assert all(h["gmres_iters"] > 0 for h in hist)
    assert all(h["converged"] for h in hist)


def test_freeze_guard_warns_in_run_async(mesh2d_path, capsys):
    """The windowed dispatch path (used by bench/long runs) carries the
    same freeze guard as run(), fed from the single stacked pull."""
    s = _make_solver("2D-2", mesh2d_path, gmres_rtol=10.0)
    _, m = s.run_async(8, window=4)
    out = capsys.readouterr().out
    assert "consecutive 0-iteration" in out
