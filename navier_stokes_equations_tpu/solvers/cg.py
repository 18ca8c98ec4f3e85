"""Fixed-iteration Jacobi-preconditioned conjugate gradients.

Used as the inner solve on the pressure Laplacian inside the Cahouet-Chabard
preconditioner — the TPU-native substitute for the reference's one AMG
V-cycle on K_p (reference: NavierStokes.hpp:309-315).  A fixed iteration
count keeps the operator linear-enough in practice while FGMRES outside
absorbs any nonstationarity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pcg(apply_a, b, diag, iters: int, x0=None):
    """Solve A x = b approximately; ``diag`` is the Jacobi preconditioner.

    Runs exactly ``iters`` iterations (no convergence test — the shape of the
    computation must be static under jit).  Guards against breakdown when the
    residual vanishes.
    """
    inv_d = 1.0 / diag
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - apply_a(x) if x0 is not None else b
    z = inv_d * r
    p = z
    rz = jnp.vdot(r, z)

    def body(_, carry):
        x, r, p, rz = carry
        ap = apply_a(p)
        pap = jnp.vdot(p, ap)
        safe = jnp.abs(pap) > 1e-300
        alpha = jnp.where(safe, rz / jnp.where(safe, pap, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = inv_d * r
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(jnp.abs(rz) > 1e-300, rz_new / jnp.where(jnp.abs(rz) > 1e-300, rz, 1.0), 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x
