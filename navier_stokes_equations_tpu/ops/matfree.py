"""Sum-factorized (quadrature-path) operator application.

The element-matrix path (assembly.py + operators.py) streams
``(n_el, nd, nd)`` matrices through a batched tiny matvec — fine for
assembly-once-use-once, but inside GMRES the same operator is applied dozens
of times per step and the batched 33x33 einsum runs on the VPU far below
roofline.  This module applies the same bilinear form directly from
quadrature tables:

    gather x -> interpolate (shared-table GEMMs, MXU) -> pointwise physics
    (VPU) -> test against shapes (shared-table GEMMs) -> scatter-add,

with per-element geometry folded into reference-space contractions (all
q-contractions share the same (nq, n_shape) tables across elements).
Equality with the element-matrix operator is asserted in
tests/test_matfree.py to machine precision — one weak form, two evaluation
schedules.

Covers the Oseen LHS (reference: NavierStokes.cpp:747-794) and the Newton
Jacobian (cpp:421-466) including SUPG + grad-div.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from .assembly import StepParams, _supg_tau
from .fe_arrays import FEArrays


def advection_tables(
    fe: FEArrays,
    params: StepParams,
    u_adv,  # (n_vnodes, dim): u* (Oseen) or u_k (Newton)
    newton_reaction: bool = False,
):
    """Per-step advection tables shared by every operator application.

    Factored out of :func:`make_system_operator` so callers that re-enter
    the operator through ``shard_map`` (parallel/halo_solver.py) can compute
    these once per step instead of once per Krylov iteration.
    Returns ``(uadv_q, uadv_ref, g_adv, tau)`` (``g_adv``/``tau`` may be
    zero-size placeholders when unused — see :func:`make_system_operator`).
    """
    uadv_e = u_adv[fe.elems_p2]  # (n_el, n2, dim)
    uadv_q = jnp.einsum("qa,ead->eqd", fe.p2_val, uadv_e)
    # Advection in reference coordinates: (u_adv . grad phi) = sum_k
    # uadv_ref[k] dphi/dxi_k  with  uadv_ref[k] = sum_m uadv_m jinv[k, m].
    uadv_ref = jnp.einsum("eqm,ekm->eqk", uadv_q, fe.jinv)
    g_adv = None
    if newton_reaction:
        du_ref = jnp.einsum("qak,ead->eqkd", fe.p2_refg, uadv_e)
        g_adv = jnp.einsum("eqkd,ekm->eqdm", du_ref, fe.jinv)  # grad u_k
    tau = _supg_tau(fe, params, uadv_q) if params.use_supg else None
    return uadv_q, uadv_ref, g_adv, tau


def make_system_operator(
    fe: FEArrays,
    params: StepParams,
    u_adv=None,  # (n_vnodes, dim): u* (Oseen) or u_k (Newton)
    newton_reaction: bool = False,  # add theta * (grad u_adv) u  (cpp:428-429)
    tables=None,  # precomputed advection_tables(...) output
) -> Callable:
    """Return apply(x) computing the unconstrained y = A x.

    ``newton_reaction`` selects the Newton Jacobian (the extra linearized
    convection term and SUPG's G-phi coupling); otherwise the Oseen matrix.
    Either ``u_adv`` or ``tables`` must be given.
    """
    dim, nq = fe.dim, fe.nq
    dt, theta, nu = params.dt, params.theta, params.nu

    if tables is None:
        tables = advection_tables(fe, params, u_adv, newton_reaction)
    uadv_q, uadv_ref, g_adv, tau = tables
    g1 = jnp.einsum("ck,ekd->ecd", fe.p1_refg, fe.jinv)  # (n_el, n1, dim)


    def fields(x):
        """Gather + interpolate the trial function.

        When the P2 node numbering leads with the P1 vertices
        (``fe.fused_up_gather``), velocity and pressure ride ONE
        (n_el, n2)-slot gather of row width dim+1 — TPU gather cost is per
        slot, so the pressure gather is free."""
        u = x[: fe.n_udofs].reshape(dim, fe.n_vnodes).T
        p = x[fe.n_udofs :]
        if fe.fused_up_gather:
            up = jnp.concatenate(
                [
                    u,
                    jnp.pad(p, (0, fe.n_vnodes - fe.n_p))[:, None],
                ],
                axis=1,
            )
            up_e = up[fe.elems_p2]  # (n_el, n2, dim+1)
            u_e = up_e[..., :dim]
            p_e = up_e[:, : fe.n1, dim]  # vertices lead the P2 numbering
        else:
            u_e = u[fe.elems_p2]  # (n_el, n2, dim)
            p_e = p[fe.elems_p1]  # (n_el, n1)
        u_q = jnp.einsum("qa,ead->eqd", fe.p2_val, u_e)
        du_ref = jnp.einsum("qak,ead->eqkd", fe.p2_refg, u_e)
        gu = jnp.einsum("eqkd,ekm->eqdm", du_ref, fe.jinv)  # grad u [d, m]
        p_q = jnp.einsum("qc,ec->eq", fe.p1_val, p_e)
        gradp = jnp.einsum("ec,ecd->ed", p_e, g1)  # constant per element
        return u_q, gu, p_q, gradp

    def momentum_terms(u_q, gu, p_q, gradp):
        """Pointwise physics: (V, Gref, supg_ref) per quadrature point."""
        conv = jnp.einsum("eqm,eqdm->eqd", uadv_q, gu)
        V = u_q / dt + theta * conv
        if g_adv is not None:
            V = V + theta * jnp.einsum("eqdm,eqm->eqd", g_adv, u_q)
        divu = jnp.einsum("eqdd->eq", gu)
        # Grad-tested physical tensor: theta*nu*grad u - p I (+ grad-div).
        G = theta * nu * gu
        diag_term = -p_q
        if params.use_supg:
            diag_term = diag_term + params.gamma * divu
        G = G + diag_term[:, :, None, None] * jnp.eye(dim, dtype=u_q.dtype)
        # To reference coords: Gref[d, k] = sum_m G[d, m] jinv[k, m].
        Gref = jnp.einsum("eqdm,ekm->eqdk", G, fe.jinv)
        if params.use_supg:
            op = u_q / dt + conv + gradp[:, None, :]
            if g_adv is not None:
                op = op + jnp.einsum("eqdm,eqm->eqd", g_adv, u_q)
            # tau * op[d] * uadv_ref[k] tested against dphi/dxi_k.
            Gref = Gref + tau[:, :, None, None] * op[:, :, :, None] * uadv_ref[:, :, None, :]
        return V, Gref, divu

    def integrate_velocity_rows(V, Gref):
        yv = jnp.einsum("eq,eqd,qa->ead", fe.jxw, V, fe.p2_val)
        yv = yv + jnp.einsum("eq,eqdk,qak->ead", fe.jxw, Gref, fe.p2_refg)
        return yv  # (n_el, n2, dim) — accumulate_ud's natural layout

    def apply(x):
        u_q, gu, p_q, gradp = fields(x)
        V, Gref, divu = momentum_terms(u_q, gu, p_q, gradp)
        yv_e = integrate_velocity_rows(V, Gref)
        yp_e = -jnp.einsum("eq,eq,qc->ec", fe.jxw, divu, fe.p1_val)
        return fe.accumulate_ud(yv_e, yp_e)

    def apply_velocity_block(x):
        """A_vv x: trial pressure ignored, pressure rows dropped."""
        x0 = x.at[fe.n_udofs :].set(0.0)
        u_q, gu, _, _ = fields(x0)
        zero_p = jnp.zeros_like(u_q[..., 0])
        V, Gref, _ = momentum_terms(u_q, gu, zero_p, jnp.zeros_like(u_q[:, 0, :]))
        yv_e = integrate_velocity_rows(V, Gref)
        if fe.use_gather_scatter:
            u = fe.accumulate_nodes(yv_e)  # pressure rows never formed
            return jnp.concatenate(
                [u.T.reshape(-1), jnp.zeros((fe.n_p,), u.dtype)]
            )
        return fe.accumulate_ud(yv_e, jnp.zeros((fe.n_el, fe.n1), yv_e.dtype))

    def apply_divergence(x):
        """B x: pressure rows only (the preconditioner's step 2)."""
        u = x[: fe.n_udofs].reshape(dim, fe.n_vnodes).T
        u_e = u[fe.elems_p2]
        du_ref = jnp.einsum("qak,ead->eqkd", fe.p2_refg, u_e)
        gu = jnp.einsum("eqkd,ekm->eqdm", du_ref, fe.jinv)
        divu = jnp.einsum("eqdd->eq", gu)
        yp_e = -jnp.einsum("eq,eq,qc->ec", fe.jxw, divu, fe.p1_val)
        if params.use_supg:
            # SUPG adds no pressure-row terms (stabilization tests velocity
            # functions only; reference: cpp:767-789).
            pass
        return fe.accumulate_p(yp_e)

    apply.velocity_block = apply_velocity_block
    apply.divergence = apply_divergence
    return apply
