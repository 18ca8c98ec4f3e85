"""Flexible GMRES(m), fully jit-able, TPU-shaped.

Replaces deal.II SolverGMRES + Trilinos preconditioning (reference:
NavierStokes.cpp:541-567, 833-868: restart 150, <=500/<=200 iterations,
absolute tolerance 1e-2 * ||rhs||).  Design choices for TPU:

  * right (flexible) preconditioning, so the inner Cahouet-Chabard solves
    may themselves be Krylov iterations with fixed budgets;
  * classical Gram-Schmidt with reorthogonalization (CGS2): each Arnoldi
    step is two (m+1, n) matrix-vector products — large MXU-friendly
    matmuls instead of the sequential dot chain of modified Gram-Schmidt;
  * Givens-rotation QR of the Hessenberg column per step, so the true
    residual norm is monitored without extra operator applications;
  * all control flow is lax.while_loop with static shapes (the basis is
    allocated at the restart length and masked).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class GmresResult(NamedTuple):
    x: jnp.ndarray
    converged: jnp.ndarray  # bool
    iterations: jnp.ndarray  # total Arnoldi steps
    residual: jnp.ndarray  # final residual-norm estimate


def _givens(a, b):
    r = jnp.hypot(a, b)
    safe = r > 0
    c = jnp.where(safe, a / jnp.where(safe, r, 1.0), 1.0)
    s = jnp.where(safe, b / jnp.where(safe, r, 1.0), 0.0)
    return c, s, r


def fgmres(
    apply_a: Callable,
    b: jnp.ndarray,
    precond: Callable | None = None,
    x0: jnp.ndarray | None = None,
    restart: int = 150,
    maxiter: int = 200,
    atol=None,
    rtol=1e-2,
    alloc: int | None = None,
    weight: jnp.ndarray | None = None,
    criterion: str = "rhs",
    dots: str = "plain",
    defect_floor: float = 1e-6,
) -> GmresResult:
    """Solve A x = b with right-preconditioned FGMRES(restart).

    Stopping rule: ||r|| <= max(atol, rtol * ||b||)  (the reference uses the
    absolute criterion 1e-2 * ||b||, i.e. atol=None, rtol=1e-2).

    ``criterion="defect"`` normalizes by the INITIAL residual instead:
    ||r|| <= max(atol, rtol * ||b - A x0||).  With a zero initial guess the
    two coincide (the reference's SolverControl semantics,
    NavierStokes.cpp:836); with a warm start "rhs" can accept at 0
    iterations once the old solution sits under rtol*||b|| — which froze
    a 1.36M-dof trace into O(1) coasting error (docs/DESIGN.md "accuracy
    cliff") — while "defect" demands a genuine per-step reduction of
    whatever defect the step has, so the acceptance level tightens
    automatically as the flow settles.

    ``alloc`` caps the *allocated* basis length: the CGS2 projections are
    masked matmuls over the full (m+1, n) basis, so HBM traffic per Arnoldi
    step scales with the allocation even when only k << m rows are live.
    Solves needing more than ``alloc`` steps restart there (same
    convergence guarantees, slightly different trajectory).

    ``weight``: optional diagonal weight for every inner product / norm
    (<u, v> = sum weight * u * v).  Redundant representations — e.g.
    tile-local slot vectors, where each global dof appears in several
    slots — pass the 0/1 owner mask so duplicated entries count once;
    with consistent vectors this reproduces the nodal Krylov trajectory
    exactly.

    ``dots="chunked"`` evaluates every inner product / norm as chunked
    partial sums (8192-element MXU partials, then a second-level
    reduction).  An f32 dot of length n accumulates ~sqrt(n/tile)*eps
    relative roundoff through the MXU's sequential K-tile accumulation
    (~1e-5 at 1e6 dofs — the same order as a tight rtol), which is the
    suspected source of the measured ~1.6x f32-vs-f64 iteration overhead
    at rtol<=1e-5; two-level accumulation cuts it ~5x for free (same
    FLOPs, no f64 emulation — x64 stays off on TPU).  Default "plain"
    keeps the exact validated trajectories.
    """
    n = b.shape[0]
    dtype = b.dtype
    m = min(restart, maxiter)
    if alloc is not None:
        m = min(m, alloc)
    if precond is None:
        precond = lambda v: v
    x = jnp.zeros_like(b) if x0 is None else x0
    if weight is None:
        wnorm = jnp.linalg.norm
        wdot = lambda v: v
    else:
        wnorm = lambda v: jnp.sqrt(jnp.sum(weight * v * v))
        wdot = lambda v: weight * v

    if dots == "chunked":
        CH = 8192
        nc = -(-n // CH)
        n_pad = nc * CH
        pad1 = lambda v: jnp.pad(v, (0, n_pad - n))

        def wnorm(v):  # noqa: F811 — chunked override
            p = pad1(v * wdot(v)).reshape(nc, CH).sum(axis=1)
            return jnp.sqrt(p.sum())

        def proj(V, w, mask):
            part = jnp.einsum(
                "kcj,cj->kc",
                V.reshape(m + 1, nc, CH),
                pad1(wdot(w)).reshape(nc, CH),
            )
            return part.sum(axis=1) * mask
    elif dots == "plain":
        n_pad = n
        pad1 = lambda v: v
        proj = lambda V, w, mask: (V @ wdot(w)) * mask
    else:
        raise ValueError(f"unknown dots mode {dots!r}")

    b_norm = wnorm(b)
    if criterion == "defect":
        # One extra operator application per solve; r0 is recomputed by the
        # first restart anyway (the Krylov process needs it normalized).
        # The defect_floor*||b|| floor keeps a near-perfect warm start from
        # demanding a reduction below the f32 residual-evaluation noise —
        # and is the BINDING tolerance whenever rtol*defect sits under it
        # (config.gmres_defect_floor discussion).
        # With x0 None/zero the defect IS b (||b - A*0|| == ||b||): skip the
        # operator application — every Newton inner solve lands here.
        defect_norm = b_norm if x0 is None else wnorm(b - apply_a(x))
        tol = jnp.maximum(rtol * defect_norm, defect_floor * b_norm)
    elif criterion == "rhs":
        tol = rtol * b_norm
    else:
        raise ValueError(f"unknown stopping criterion {criterion!r}")
    if atol is not None:
        tol = jnp.maximum(tol, atol)
    # If b == 0 the solution is x = 0 (constrained dofs carry b's values, so
    # this happens only in degenerate cases).
    trivial = b_norm == 0

    max_restarts = -(-maxiter // m)  # ceil

    def restart_body(outer_carry):
        x, total_it, res, _ = outer_carry
        r = b - apply_a(x)
        beta = wnorm(r)

        V = jnp.zeros((m + 1, n_pad), dtype)
        Z = jnp.zeros((m, n), dtype)
        R = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        V = V.at[0].set(
            pad1(jnp.where(beta > 0, r / jnp.where(beta > 0, beta, 1.0), r))
        )

        def inner_cond(c):
            V, Z, R, cs, sn, g, k, it, res = c
            return (k < m) & (res > tol) & (it < maxiter)

        def inner_body(c):
            V, Z, R, cs, sn, g, k, it, res = c
            z = precond(V[k][:n])
            w = apply_a(z)
            Z = Z.at[k].set(z)

            mask = (jnp.arange(m + 1) <= k).astype(dtype)
            # CGS2: two full-basis projections (big matmuls on the MXU).
            h1 = proj(V, w, mask)
            w = w - (V.T @ h1)[:n]
            h2 = proj(V, w, mask)
            w = w - (V.T @ h2)[:n]
            h = h1 + h2
            wn = wnorm(w)
            col = h.at[k + 1].set(wn)
            V = V.at[k + 1].set(
                pad1(jnp.where(wn > 0, w / jnp.where(wn > 0, wn, 1.0), w))
            )

            # Apply previous rotations to the new column.
            def rot_body(j, col):
                cj, sj = cs[j], sn[j]
                a1 = col[j]
                a2 = col[j + 1]
                upd1 = cj * a1 + sj * a2
                upd2 = -sj * a1 + cj * a2
                do = j < k
                col = col.at[j].set(jnp.where(do, upd1, a1))
                col = col.at[j + 1].set(jnp.where(do, upd2, a2))
                return col

            col = jax.lax.fori_loop(0, m, rot_body, col)
            ck, sk, rk = _givens(col[k], col[k + 1])
            col = col.at[k].set(rk).at[k + 1].set(0.0)
            cs = cs.at[k].set(ck)
            sn = sn.at[k].set(sk)
            gk = g[k]
            g = g.at[k].set(ck * gk).at[k + 1].set(-sk * gk)
            R = R.at[:, k].set(col)
            res = jnp.abs(g[k + 1])
            return V, Z, R, cs, sn, g, k + 1, it + 1, res

        init = (V, Z, R, cs, sn, g, jnp.asarray(0, jnp.int32), total_it, beta)
        V, Z, R, cs, sn, g, k, total_it, res = jax.lax.while_loop(inner_cond, inner_body, init)

        # Back-substitution on the k x k leading system (padded with identity).
        idx = jnp.arange(m)
        done_cols = idx < k
        Rm = jnp.where(done_cols[None, :] & done_cols[:, None], R[:m, :], jnp.eye(m, dtype=dtype))
        gm = jnp.where(done_cols, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
        x = x + Z.T @ y
        return x, total_it, res, res <= tol

    def outer_cond(c):
        _, total_it, res, conv = c
        return (~conv) & (total_it < maxiter)

    x, total_it, res, conv = jax.lax.while_loop(
        outer_cond,
        restart_body,
        (x, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, dtype), jnp.asarray(False)),
    )

    x = jnp.where(trivial, jnp.zeros_like(b), x)
    conv = conv | trivial
    return GmresResult(x=x, converged=conv, iterations=total_it, residual=res)
