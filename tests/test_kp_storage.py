"""Reduced-precision storage of the dense K_p^{-1} (config.kp_inv_storage).

The dense Schur matvec is HBM-byte-bound (docs/roofline.json: 58% of peak,
~1.3 GB read per application on the 2D-2 headline); "f16" halves the bytes
and "bf16x2" keeps f32 bytes but runs native-MXU bf16 passes.  Both must
(a) approximate the f32 matvec to their mantissa budget and (b) leave the
FGMRES iteration count and the physics of a short 2D-2 window unchanged
(the preconditioner direction, not the solution, absorbs the rounding —
FGMRES is flexible).  Naive single-bf16 is excluded by measurement (2D-2
FGMRES stops converging; solvers/preconditioners.py).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.ops import dirichlet, fe_arrays
from navier_stokes_equations_tpu.solvers import preconditioners as pc


@pytest.fixture(scope="module")
def pressure_setup(mesh2d):
    fe = fe_arrays.build_fe_arrays(mesh2d, dtype=jnp.float32)
    pin = dirichlet.pressure_pin_mask(mesh2d, fe)
    return fe, pin


@pytest.mark.parametrize("storage,rtol", [("f16", 3e-3), ("bf16x2", 1e-4)])
def test_reduced_apply_matches_f32(pressure_setup, storage, rtol):
    fe, pin = pressure_setup
    pops32 = pc.build_pressure_operators(fe, pin, dense_max=10**6)
    pops_r = pc.build_pressure_operators(
        fe, pin, dense_max=10**6, kp_inv_storage=storage
    )
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal(fe.n_p), jnp.float32)
    t = jnp.where(pops32.pin_mask, 0.0, t)
    y32 = pc.apply_kp_inv(pops32, t)
    yr = pc.apply_kp_inv(pops_r, t)
    err = float(jnp.linalg.norm(yr - y32) / jnp.linalg.norm(y32))
    assert err < rtol, f"{storage}: relative apply error {err:.2e}"


@pytest.mark.parametrize("storage", ["f16", "bf16x2"])
def test_solver_convergence_unchanged(mesh2d_path, storage):
    """Short 2D-2 window: same iteration budget and same physics as f32."""
    base = dataclasses.replace(
        test_cases.make("2D-2"), dtype="float32",
        precond_schur_dense_max=10**6,
    )
    runs = {}
    for st in ("f32", storage):
        s = solver.NavierStokesSolver(
            dataclasses.replace(base, kp_inv_storage=st),
            mesh2d_path,
        )
        _, hist = s.run(n_steps=10)
        assert all(r["converged"] for r in hist), f"{st}: non-converged step"
        runs[st] = hist
    its32 = sum(r["gmres_iters"] for r in runs["f32"])
    its_r = sum(r["gmres_iters"] for r in runs[storage])
    # The rounded preconditioner direction may cost a few extra iterations,
    # but an order-of-magnitude blowup means the format is unusable.
    assert its_r <= 1.3 * its32 + 5, (its_r, its32)
    assert abs(runs[storage][-1]["Cd"] - runs["f32"][-1]["Cd"]) < 1e-3
    assert abs(runs[storage][-1]["DeltaP"] - runs["f32"][-1]["DeltaP"]) < 1e-3
