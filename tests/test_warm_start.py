"""Warm-start predictor options for the linearized Krylov solves.

The reference always starts GMRES from zero (NavierStokes.cpp:849,560);
this engine warm-starts by default.  gmres_warm_start_mode selects the
predictor: "previous" (x^n) or "extrap_u" (velocity extrapolated to the
clamped 2u^n - u^{n-1} = the Oseen advection field, pressure held at p^n
— full-state extrapolation was measured harmful, see config.py).
The predictor changes only the Krylov START, so at tight tolerance the
accepted trajectory must be predictor-independent.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.ops import assembly

MESH = "/root/reference/meshes/mesh-2D.msh"


def _cfg(**over):
    cfg = test_cases.make("2D-2", deltat=0.01)
    return dataclasses.replace(cfg, dtype="float64", **over)


def test_extrap_u_predictor_structure():
    # Velocity rows carry the clamped extrapolation, pressure rows p^n.
    s = solver.NavierStokesSolver(_cfg(gmres_warm_start_mode="extrap_u"), MESH)
    fe = s.fe
    rng = np.random.default_rng(0)
    x_n = jnp.asarray(rng.normal(size=fe.n_dofs))
    x_nm1 = jnp.asarray(rng.normal(size=fe.n_dofs))
    st = dataclasses.replace(
        s.initial_state(), x_old=x_n, x_old_old=x_nm1,
        first_step=jnp.asarray(False), second_step=jnp.asarray(False),
    )
    u_n, p_n = fe.split(x_n)
    u_nm1, _ = fe.split(x_nm1)
    u_star = assembly.extrapolate_advection(u_n, u_nm1, jnp.asarray(False))
    x0 = s._lin_warm_start(st, u_star, fe)
    np.testing.assert_allclose(np.asarray(fe.split(x0)[0]), np.asarray(u_star))
    np.testing.assert_allclose(np.asarray(fe.split(x0)[1]), np.asarray(p_n))


def test_extrap_u_trajectory_matches_previous_at_tight_tol():
    # At rtol=1e-10 both predictors converge each solve to the same
    # solution, so 10 accepted steps must agree to solver tolerance.
    states = {}
    for mode in ("previous", "extrap_u"):
        s = solver.NavierStokesSolver(
            _cfg(gmres_rtol=1e-10, gmres_warm_start_mode=mode), MESH
        )
        st = s.initial_state()
        for _ in range(10):
            st, m = s.step(st)
            assert bool(m.converged)
        states[mode] = np.asarray(st.x_old)
    err = np.linalg.norm(states["extrap_u"] - states["previous"]) / np.linalg.norm(
        states["previous"]
    )
    assert err < 1e-7, err
