"""Distributed Schur K_p solve on the halo layout.

The halo preconditioner's Schur step needs z ~ K_p^{-1} t every FGMRES
iteration.  The first-generation implementation gathered the owned pressure
residual to the REPLICATED global space and ran the global two-grid
(preconditioners.make_kp_solve) redundantly on every device — O(n_p)
traffic per application and O(global) work per device, the known
multi-chip scaling wall (docs/DESIGN.md round-3 item 5).

This module keeps the whole solve in the owned-block layout:

  * K_p applications run on strip-LOCAL element matrices (kp_e/mp_e are
    already carried by the per-strip ``FEArrays`` stack) with O(interface)
    pressure-only ppermute exchanges around them (halo_fe.import_halo_p /
    export_halo_p) — the same schedule as the operator matvec;
  * the aggregation two-grid's coarse residual is restricted per strip
    (bucketed gathers over OWNED vertices — every global vertex is owned by
    exactly one strip, so the partial sums partition the global sums) and
    combined with ONE O(n_c) psum; the tiny dense coarse inverse stays
    replicated, exactly as the coarse solve of a distributed AMG stack;
  * the Jacobi-CG fallback distributes the same way, with psum-reduced dot
    products (the MPI reductions of a Trilinos CG).

The arithmetic is the same as ``preconditioners.make_kp_solve`` up to
floating-point reassociation of the accumulations, so outer Krylov
iteration counts are unchanged (asserted in tests/test_halo_schur.py).
The DENSE K_p^{-1} strategy (pressure spaces small enough to invert,
config.precond_schur_dense_max) keeps the replicated gather path in
parallel/halo_solver.py — at those sizes the gather is cheap and sharding
an O(n_p^2) matmul would add a collective to save nothing.

Reference: the AMG V-cycle on K_p (NavierStokes.hpp:309-315) runs
distributed in Trilinos ML with a replicated coarse solve — this is its
TPU-native equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import halo_fe as hf
from .halo_fe import HaloFE, _stacked_bucketed_maps


def build_schur_statics(hfe: HaloFE, pops) -> dict:
    """Host-side distributed-K_p statics, keyed for HaloStatics fields.

    Returns ``kp_diag_p`` (P, n_lp) — the regularized-K_p diagonal on owned
    slots (1.0 at pads/halo, so Jacobi divisions are inert there) — and,
    for the two-grid strategy, ``agg_own`` (P, n_lp) int32 aggregate ids of
    owned vertices (sentinel n_c elsewhere) plus the per-strip bucketed
    restriction maps ``agg_gather`` (tuple of (P, n_c+1, w)).
    """
    P_, n_lp, n_op = hfe.n_shards, hfe.n_lp, hfe.n_op_max
    npg = hfe.n_p_glob
    ov = np.asarray(hfe.owned_verts)  # (P, n_op_max), sentinel npg
    valid = ov < npg

    kd = np.asarray(pops.kp_diag)
    kp_diag = np.ones((P_, n_lp), kd.dtype)
    kp_diag[:, :n_op][valid] = kd[ov[valid]]
    out = dict(kp_diag_p=jnp.asarray(kp_diag))

    if pops.two_level:
        n_c = int(pops.kc_inv.shape[0])
        agg = np.asarray(pops.agg_ids)  # (n_p,), pinned already -> n_c
        agg_own = np.full((P_, n_lp), n_c, np.int64)
        agg_own[:, :n_op][valid] = agg[ov[valid]]
        # Restriction maps over the OWNED region only (halo partials are
        # zero by construction), with the trash aggregate n_c (pads +
        # pinned) split into its own bucket so its multiplicity does not
        # widen the real aggregates' gather rows — the same [n_c] bound as
        # the global map in build_pressure_operators.
        maps = _stacked_bucketed_maps(
            [agg_own[s, :n_op][:, None] for s in range(P_)], n_c + 1, [n_c]
        )
        out.update(
            agg_own=jnp.asarray(agg_own.astype(np.int32)),
            agg_gather=tuple(jnp.asarray(g) for g in maps),
        )
    return out


def make_kp_solve_local(
    hfe: HaloFE, fe_loc, pin, kp_diag, agg_own, agg_gather, send_verts,
    kc_inv, *, eps: float, two_level: bool, kp_iters: int, cycles: int,
):
    """Return solve(t) ~ K_p^{-1} t on this shard's (n_lp,) owned block.

    Runs INSIDE a shard_map body: ``fe_loc`` is the strip-local FEArrays,
    ``t`` is owned-valued (halo slots and pinned dofs zero) and the result
    is owned-valued too.  Mirrors ``preconditioners.make_kp_solve``.
    """
    ax = hfe.axis
    A_e = fe_loc.kp_e + eps * fe_loc.mp_e

    def kp_apply(z):
        zf = jnp.where(pin, 0.0, z)
        zh = hf.import_halo_p(hfe, zf, send_verts)
        y_e = jnp.einsum("ecf,ef->ec", A_e, zh[fe_loc.elems_p1])
        y = hf.export_halo_p(hfe, fe_loc.accumulate_p(y_e), send_verts)
        return jnp.where(pin, z, y)

    if two_level:
        n_c = kc_inv.shape[0]
        omega = 0.8

        def smooth(z, t, sweeps):
            for _ in range(sweeps):
                r = jnp.where(pin, 0.0, t - kp_apply(z))
                z = z + omega * r / kp_diag
            return z

        def solve(t):
            z = omega * t / kp_diag
            for _ in range(cycles):
                z = smooth(z, t, 1)
                r1 = jnp.where(pin, 0.0, t - kp_apply(z))
                flat = jnp.concatenate(
                    [r1[: hfe.n_op_max], jnp.zeros((1,), r1.dtype)]
                )
                r_c = jnp.concatenate(
                    [flat[g].sum(axis=1) for g in agg_gather]
                )[:n_c]
                r_c = jax.lax.psum(r_c, ax)
                z_c = jnp.matmul(
                    kc_inv, r_c.astype(kc_inv.dtype),
                    preferred_element_type=r_c.dtype,
                ).astype(r_c.dtype)
                z = z + jnp.concatenate([z_c, jnp.zeros((1,), z_c.dtype)])[agg_own]
                z = smooth(z, t, 2)
            return z

        return solve

    # Jacobi-CG fallback (cg.pcg with psum-reduced reductions; identical
    # update formulas so the iterates match the replicated solve).
    inv_d = 1.0 / kp_diag

    def wdot(a, b):
        return jax.lax.psum(jnp.vdot(a, b), ax)

    def solve(t):
        x = jnp.zeros_like(t)
        r = t
        z = inv_d * r
        p = z
        rz = wdot(r, z)

        def body(_, carry):
            x, r, p, rz = carry
            ap = kp_apply(p)
            pap = wdot(p, ap)
            safe = jnp.abs(pap) > 1e-300
            alpha = jnp.where(safe, rz / jnp.where(safe, pap, 1.0), 0.0)
            x = x + alpha * p
            r = r - alpha * ap
            z = inv_d * r
            rz_new = wdot(r, z)
            safe_b = jnp.abs(rz) > 1e-300
            beta = jnp.where(safe_b, rz_new / jnp.where(safe_b, rz, 1.0), 0.0)
            return x, r, z + beta * p, rz_new

        x, _, _, _ = jax.lax.fori_loop(0, kp_iters, body, (x, r, p, rz))
        return x

    return solve
