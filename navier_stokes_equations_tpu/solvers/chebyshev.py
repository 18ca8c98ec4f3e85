"""Chebyshev iteration — the TPU substitute for ILU smoothing.

ILU(1), the reference's velocity-block preconditioner (reference:
NavierStokes.hpp:301-304), is a sequential triangular sweep that cannot be
parallelized on a TPU.  A diagonally-scaled Chebyshev polynomial iteration
has equivalent smoothing power per FLOP, is built ONLY from operator
applications (no inner products — no cross-core latency), and its spectrum
bounds are estimated per step by a short power iteration (also reduction-
light).  This is the standard matrix-free smoother choice (cf. deal.II's own
PreconditionChebyshev used in its matrix-free solvers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_lmax(apply_a, diag, probe, iters: int = 10, safety: float = 1.1):
    """Largest eigenvalue of D^{-1} A by power iteration.

    ``probe`` is any nonzero starting vector of the right shape (a fixed
    deterministic vector keeps the step function free of RNG state).
    """
    inv_d = 1.0 / diag

    def body(_, carry):
        v, _ = carry
        w = inv_d * apply_a(v)
        nrm = jnp.linalg.norm(w)
        v_new = w / jnp.maximum(nrm, 1e-30)
        return v_new, nrm

    v0 = probe / jnp.maximum(jnp.linalg.norm(probe), 1e-30)
    _, lmax = jax.lax.fori_loop(0, iters, body, (v0, jnp.asarray(1.0, probe.dtype)))
    return lmax * safety


def chebyshev(apply_a, r, diag, lmax, degree: int, lmin_ratio: float = 1.0 / 30.0):
    """Approximate A^{-1} r with a degree-``degree`` Chebyshev polynomial of
    the Jacobi-preconditioned operator, targeting [lmin, lmax] with
    lmin = lmin_ratio * lmax (the classic smoothing range).
    """
    lmin = lmin_ratio * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    inv_d = 1.0 / diag

    # Standard three-term recurrence (Saad, Iterative Methods, alg. 12.1).
    sigma = theta / delta
    rho = 1.0 / sigma
    z = inv_d * r / theta
    if degree <= 1:
        return z
    d_vec = z

    def body(_, carry):
        z, d_vec, rho = carry
        resid = inv_d * (r - apply_a(z))
        rho_new = 1.0 / (2.0 * sigma - rho)
        d_new = rho_new * rho * d_vec + (2.0 * rho_new / delta) * resid
        return z + d_new, d_new, rho_new

    z, _, _ = jax.lax.fori_loop(0, degree - 1, body, (z, d_vec, rho))
    return z
