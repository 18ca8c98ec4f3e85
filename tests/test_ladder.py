"""The dt-retry / BE-fallback ladder (reference: NavierStokes.cpp:1209-1289).

Force linear-solve failures with a starved GMRES budget and verify the
ladder semantics: substep halving, eventual acceptance, truthful flags,
and host-ladder == in-graph-ladder behavior.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.models import solver, test_cases

MESH = "/root/reference/meshes/mesh-2D.msh"


def _cfg(**over):
    cfg = test_cases.make("2D-2", deltat=0.01)
    return dataclasses.replace(cfg, dtype="float64", **over)


def test_happy_path_uses_nominal_dt():
    s = solver.NavierStokesSolver(_cfg(), MESH)
    st = s.initial_state()
    st, m = s.step(st)
    assert bool(m.converged)
    assert float(m.dt_used) == pytest.approx(0.01)


def test_starved_budget_descends_the_ladder():
    # 2 Krylov iterations at a tight tolerance cannot converge: every trial
    # fails, the ladder halves dt (<= 4 times) and finally force-accepts the
    # BE attempt while reporting converged=False (reference: cpp:1281-1286).
    s = solver.NavierStokesSolver(
        _cfg(gmres_maxiter_linear=2, gmres_rtol=1e-14, gmres_warm_start=False), MESH
    )
    st = s.initial_state()
    st2, m = s.step(st)
    assert not bool(m.converged)
    assert float(m.dt_used) == pytest.approx(0.01 * 0.5**s.cfg.max_substeps)
    # The clock still advances by the nominal dt (reference behavior).
    assert float(st2.time) == pytest.approx(0.01)
    assert np.isfinite(np.asarray(st2.x_old)).all()
    # Total iterations account for every failed trial.
    assert int(m.gmres_iters) == 2 * s._n_trials


def test_host_ladder_matches_in_graph_ladder():
    s = solver.NavierStokesSolver(_cfg(), MESH)
    st = s.initial_state()
    host_state, host_m = s.step(st)
    graph_state, graph_m = jax.jit(s._step)(st, s.fe, s.pressure_ops)
    np.testing.assert_allclose(
        np.asarray(graph_state.x_old), np.asarray(host_state.x_old), atol=1e-12
    )
    assert bool(graph_m.converged) == bool(host_m.converged)
