"""Batched element-system assembly for the theta-method Navier-Stokes solver.

Each function returns per-element dense systems ``(A_e, b_e)`` with
``A_e: (n_el, nd, nd)`` and ``b_e: (n_el, nd)`` where ``nd = dim*n2 + n1``
(Taylor-Hood P2 velocity, P1 pressure; local DoFs component-major to match
the global block layout).  The global operator is never formed: GMRES applies
``A`` matrix-free as gather -> batched matvec -> scatter-add
(``operators.py``).  All loops are einsums over the quadrature index, batched
over elements — MXU-friendly by construction.

Weak forms replicate the reference bit-for-bit in exact arithmetic:
  * semi-implicit (Oseen) system — reference src/classes/NavierStokes.cpp:
    699-795 (theta-weighted RHS 699-720, LHS 747-765, SUPG 722-745/767-789,
    grad-div 791-794);
  * Newton Jacobian + residual — reference NavierStokes.cpp:353-511
    (residual 377-418, Jacobian 421-437, SUPG 439-466/477-510);
  * SUPG tau = ((2/dt)^2 + (2|u|/h)^2 + (4 nu/h^2)^2)^(-1/2) per quadrature
    point with h = cell diameter — reference NavierStokes.cpp:444-448;
  * grad-div gamma = 0.1 — reference NavierStokes.cpp:463, 793.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .fe_arrays import FEArrays


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepParams:
    """Traced scalar parameters of one (sub)step."""

    dt: Any  # traced: the retry ladder halves it (reference: cpp:1224-1235)
    theta: Any  # traced: BE fallback forces 1.0 (reference: cpp:1241-1252)
    nu: Any
    rho: Any
    gamma: Any  # grad-div coefficient
    use_supg: bool = dataclasses.field(metadata=dict(static=True))


def _supg_tau(fe: FEArrays, params: StepParams, u_adv_q):
    """(n_el, nq) stabilization parameter."""
    h = fe.diameters[:, None]
    umag = jnp.linalg.norm(u_adv_q, axis=-1)
    return 1.0 / jnp.sqrt(
        (2.0 / params.dt) ** 2 + (2.0 * umag / h) ** 2 + (4.0 * params.nu / h**2) ** 2
    )


def _interp_u(fe: FEArrays, u_e):
    """Nodal (n_el, n2, dim) -> values at quadrature points (n_el, nq, dim)."""
    return jnp.einsum("qa,ead->eqd", fe.p2_val, u_e)


def _interp_grad_u(fe: FEArrays, g2, u_e):
    """-> (n_el, nq, dim, dim) with grad_u[d, k] = du_d / dx_k."""
    return jnp.einsum("eqak,ead->eqdk", g2, u_e)


def _blocks_to_element_matrix(fe: FEArrays, diag_vv, cross_vv, A_vp, A_pv):
    """Compose the (nd, nd) element matrix from its physical blocks.

    diag_vv:  (n_el, n2, n2)            multiplied by delta_{component}
    cross_vv: (n_el, n2, dim, n2, dim)  component-coupling part (or None)
    A_vp:     (n_el, n2, dim, n1)
    A_pv:     (n_el, n1, n2, dim)
    """
    dim, n2, n1 = fe.dim, fe.n2, fe.n1
    eye = jnp.eye(dim, dtype=diag_vv.dtype)
    # (e, d, a, f, b): delta_df * diag[a, b] + cross[a, d, b, f]
    vv = jnp.einsum("df,eab->edafb", eye, diag_vv)
    if cross_vv is not None:
        vv = vv + jnp.transpose(cross_vv, (0, 2, 1, 4, 3))
    vv = vv.reshape(fe.n_el, dim * n2, dim * n2)
    vp = jnp.transpose(A_vp, (0, 2, 1, 3)).reshape(fe.n_el, dim * n2, n1)
    pv = jnp.transpose(A_pv, (0, 1, 3, 2)).reshape(fe.n_el, n1, dim * n2)
    pp = jnp.zeros((fe.n_el, n1, n1), diag_vv.dtype)
    top = jnp.concatenate([vv, vp], axis=2)
    bot = jnp.concatenate([pv, pp], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def rhs_to_element(fe: FEArrays, b_v, b_p=None):
    """((n_el, n2, dim) velocity rows, optional (n_el, n1) pressure rows)
    -> (n_el, nd) element RHS in the component-major local layout."""
    bv = jnp.transpose(b_v, (0, 2, 1)).reshape(fe.n_el, fe.dim * fe.n2)
    if b_p is None:
        b_p = jnp.zeros((fe.n_el, fe.n1), b_v.dtype)
    return jnp.concatenate([bv, b_p], axis=1)


def blocks_diag(fe: FEArrays, diag_vv, cross_vv):
    """(n_el, nd) element-row matrix diagonal from the physical blocks
    (pressure rows are zero: the saddle system has no pp block)."""
    dv = jnp.diagonal(diag_vv, axis1=1, axis2=2)  # (n_el, n2)
    cols = []
    for i in range(fe.dim):
        d = dv
        if cross_vv is not None:
            d = d + jnp.diagonal(cross_vv[:, :, i, :, i], axis1=1, axis2=2)
        cols.append(d)
    return jnp.concatenate(
        cols + [jnp.zeros((fe.n_el, fe.n1), dv.dtype)], axis=1
    )


def _vel_rhs_to_element(fe: FEArrays, b_v):
    """(n_el, n2, dim) velocity test-function RHS -> (n_el, nd)."""
    bv = jnp.transpose(b_v, (0, 2, 1)).reshape(fe.n_el, fe.dim * fe.n2)
    bp = jnp.zeros((fe.n_el, fe.n1), b_v.dtype)
    return jnp.concatenate([bv, bp], axis=1)


def _divergence_blocks(fe: FEArrays, g2):
    """B blocks: A_vp[a,d,c] = -int psi_c d_d phi_a ; A_pv = its transpose."""
    bmat = -jnp.einsum("eq,qc,eqad->eadc", fe.jxw, fe.p1_val, g2)
    return bmat, jnp.transpose(bmat, (0, 3, 1, 2))


def oseen_blocks(
    fe: FEArrays,
    params: StepParams,
    u_star,  # (n_vnodes, dim) extrapolated advection field
    u_old,  # (n_vnodes, dim)
    f_new_q: Optional[Any] = None,  # (n_el, nq, dim) forcing at t^{n+1}
    f_old_q: Optional[Any] = None,
):
    """Physical blocks of the semi-implicit (Oseen) element system
    (reference: cpp:569-831) WITHOUT composing the (nd, nd) element matrix:

      diag_vv (n_el, n2, n2)           component-diagonal velocity block
      cross_vv (n_el, n2, dim, n2, dim) component coupling, or None
      A_vp (n_el, n2, dim, n1), A_pv (n_el, n1, n2, dim)
      b_v (n_el, n2, dim)              velocity test-function RHS

    The tile-assembled operator path consumes these directly
    (ops/tile_operator.py) — the (nd, nd) scatter is the expensive part
    of :func:`oseen_system` and carries no information beyond the blocks.
    """
    g2 = fe.phys_grads_p2()
    ustar_e = fe.gather_u(u_star)
    uold_e = fe.gather_u(u_old)
    ustar_q = _interp_u(fe, ustar_e)  # (n_el, nq, dim)
    uold_q = _interp_u(fe, uold_e)
    graduold_q = _interp_grad_u(fe, g2, uold_e)

    dt, theta, nu = params.dt, params.theta, params.nu

    # (u* . grad) phi_b at each q: (n_el, nq, n2)
    adv_b = jnp.einsum("eqd,eqbd->eqb", ustar_q, g2)

    mass = jnp.einsum("eq,qa,qb->eab", fe.jxw, fe.p2_val, fe.p2_val)
    stiff = jnp.einsum("eq,eqad,eqbd->eab", fe.jxw, g2, g2)
    conv = jnp.einsum("eq,qa,eqb->eab", fe.jxw, fe.p2_val, adv_b)
    diag_vv = mass / dt + theta * nu * stiff + theta * conv

    A_vp, A_pv = _divergence_blocks(fe, g2)
    cross_vv = None

    # --- RHS (velocity rows) -------------------------------------------
    # (1/dt)(u^n, phi) - (1-theta) nu (grad u^n, grad phi)
    #                  - (1-theta) ((u^n . grad) u^n, phi)
    conv_old = jnp.einsum("eqdk,eqk->eqd", graduold_q, uold_q)
    b_v = jnp.einsum("eq,eqd,qa->ead", fe.jxw, uold_q / dt, fe.p2_val)
    b_v -= (1.0 - theta) * nu * jnp.einsum("eq,eqdk,eqak->ead", fe.jxw, graduold_q, g2)
    b_v -= (1.0 - theta) * jnp.einsum("eq,eqd,qa->ead", fe.jxw, conv_old, fe.p2_val)

    f_theta = None
    if f_new_q is not None:
        f_theta = theta * f_new_q + (1.0 - theta) * f_old_q
        b_v += jnp.einsum("eq,eqd,qa->ead", fe.jxw, f_theta, fe.p2_val)

    # --- SUPG + grad-div (3D cases; reference: cpp:722-745, 767-794) ----
    if params.use_supg:
        tau = _supg_tau(fe, params, ustar_q)  # (n_el, nq)
        # test[e,q,a] = tau (u* . grad phi_a)
        test = tau[:, :, None] * jnp.einsum("eqd,eqad->eqa", ustar_q, g2)
        # LHS velocity-velocity: (test_a, phi_b/dt + (u*.grad)phi_b)
        op_b = fe.p2_val[None, :, :] / dt + adv_b
        diag_vv += jnp.einsum("eq,eqa,eqb->eab", fe.jxw, test, op_b)
        # LHS velocity-pressure: (test_a e_d, grad psi_c)
        g1 = fe.phys_grads_p1()  # (n_el, n1, dim)
        s_a = jnp.einsum("eq,eqa->ea", fe.jxw, test)
        A_vp = A_vp + jnp.einsum("ea,ecd->eadc", s_a, g1)
        # grad-div: gamma (div phi_a e_d, div phi_b e_f)
        cross_vv = params.gamma * jnp.einsum("eq,eqad,eqbf->eadbf", fe.jxw, g2, g2)
        # RHS consistency: (test_a e_d, f_theta + u^n/dt)
        rhs_src = uold_q / dt
        if f_theta is not None:
            rhs_src = rhs_src + f_theta
        b_v += jnp.einsum("eq,eqa,eqd->ead", fe.jxw, test, rhs_src)

    return diag_vv, cross_vv, A_vp, A_pv, b_v


def oseen_system(
    fe: FEArrays,
    params: StepParams,
    u_star,  # (n_vnodes, dim) extrapolated advection field
    u_old,  # (n_vnodes, dim)
    f_new_q: Optional[Any] = None,  # (n_el, nq, dim) forcing at t^{n+1}
    f_old_q: Optional[Any] = None,
):
    """Semi-implicit (Oseen) element system (reference: cpp:569-831)."""
    diag_vv, cross_vv, A_vp, A_pv, b_v = oseen_blocks(
        fe, params, u_star, u_old, f_new_q, f_old_q
    )
    A_e = _blocks_to_element_matrix(fe, diag_vv, cross_vv, A_vp, A_pv)
    b_e = _vel_rhs_to_element(fe, b_v)
    return A_e, b_e


def oseen_rhs_diag(
    fe: FEArrays,
    params: StepParams,
    u_star,  # (n_vnodes, dim) extrapolated advection field
    u_old,  # (n_vnodes, dim)
    f_new_q: Optional[Any] = None,
    f_old_q: Optional[Any] = None,
):
    """RHS and matrix diagonal of the Oseen system WITHOUT the matrices.

    On the quadrature (matrix-free) operator path the full ``(nd, nd)``
    element matrices of :func:`oseen_system` are consumed only for their
    diagonal (Jacobi/Chebyshev preconditioning) and the RHS — forming the
    other ~95% of entries costs ~10 ms/step at mesh-2D-100.  This computes
    exactly ``(diagonal(A_e), b_e)`` (same weak form, reference:
    NavierStokes.cpp:699-795); equality is asserted in tests/test_assembly.py.

    Returns ``(diag_e (n_el, nd), b_e (n_el, nd))`` in component-major local
    layout (pressure diagonal is zero: A_pp = 0).
    """
    g2 = fe.phys_grads_p2()
    ustar_e = fe.gather_u(u_star)
    uold_e = fe.gather_u(u_old)
    ustar_q = _interp_u(fe, ustar_e)
    uold_q = _interp_u(fe, uold_e)
    graduold_q = _interp_grad_u(fe, g2, uold_e)

    dt, theta, nu = params.dt, params.theta, params.nu

    adv_a = jnp.einsum("eqd,eqad->eqa", ustar_q, g2)  # (u* . grad) phi_a

    mass_d = jnp.einsum("eq,qa,qa->ea", fe.jxw, fe.p2_val, fe.p2_val)
    stiff_d = jnp.einsum("eq,eqad,eqad->ea", fe.jxw, g2, g2)
    conv_d = jnp.einsum("eq,qa,eqa->ea", fe.jxw, fe.p2_val, adv_a)
    diag_common = mass_d / dt + theta * nu * stiff_d + theta * conv_d  # (n_el, n2)
    diag_vd = jnp.broadcast_to(diag_common[:, :, None], (fe.n_el, fe.n2, fe.dim))

    # --- RHS (identical formulas to oseen_system) -----------------------
    conv_old = jnp.einsum("eqdk,eqk->eqd", graduold_q, uold_q)
    b_v = jnp.einsum("eq,eqd,qa->ead", fe.jxw, uold_q / dt, fe.p2_val)
    b_v -= (1.0 - theta) * nu * jnp.einsum("eq,eqdk,eqak->ead", fe.jxw, graduold_q, g2)
    b_v -= (1.0 - theta) * jnp.einsum("eq,eqd,qa->ead", fe.jxw, conv_old, fe.p2_val)

    f_theta = None
    if f_new_q is not None:
        f_theta = theta * f_new_q + (1.0 - theta) * f_old_q
        b_v += jnp.einsum("eq,eqd,qa->ead", fe.jxw, f_theta, fe.p2_val)

    if params.use_supg:
        tau = _supg_tau(fe, params, ustar_q)
        test = tau[:, :, None] * jnp.einsum("eqd,eqad->eqa", ustar_q, g2)
        op_a = fe.p2_val[None, :, :] / dt + adv_a
        diag_vd = diag_vd + jnp.einsum("eq,eqa,eqa->ea", fe.jxw, test, op_a)[:, :, None]
        # grad-div diagonal depends on the component: gamma (d_d phi_a)^2.
        diag_vd = diag_vd + params.gamma * jnp.einsum(
            "eq,eqad,eqad->ead", fe.jxw, g2, g2
        )
        rhs_src = uold_q / dt
        if f_theta is not None:
            rhs_src = rhs_src + f_theta
        b_v += jnp.einsum("eq,eqa,eqd->ead", fe.jxw, test, rhs_src)

    # Component-major (d, a) packing, pressure rows zero.
    diag_v = jnp.transpose(diag_vd, (0, 2, 1)).reshape(fe.n_el, fe.dim * fe.n2)
    zeros_p = jnp.zeros((fe.n_el, fe.n1), diag_v.dtype)
    diag_e = jnp.concatenate([diag_v, zeros_p], axis=1)
    return diag_e, _vel_rhs_to_element(fe, b_v)


def oseen_nodeblock_diag(fe: FEArrays, params: StepParams, u_star):
    """Per-node dim x dim diagonal blocks of the Oseen velocity operator.

    B[e, a, d, f] = delta_df * (M/dt + theta nu K + theta C + SUPG)_aa
                    + gamma * int (d_d phi_a)(d_f phi_a)        [grad-div]

    Scalar Jacobi ignores the grad-div component coupling (gamma = 0.1,
    reference: cpp:463,793), which degrades the 3D preconditioner; the
    3 x 3 node blocks capture it at negligible cost (accumulated once per
    step via width-9 row gathers, inverted in closed form).
    """
    g2 = fe.phys_grads_p2()
    ustar_e = fe.gather_u(u_star)
    ustar_q = _interp_u(fe, ustar_e)
    dt, theta, nu = params.dt, params.theta, params.nu

    adv_a = jnp.einsum("eqd,eqad->eqa", ustar_q, g2)
    mass_d = jnp.einsum("eq,qa,qa->ea", fe.jxw, fe.p2_val, fe.p2_val)
    stiff_d = jnp.einsum("eq,eqad,eqad->ea", fe.jxw, g2, g2)
    conv_d = jnp.einsum("eq,qa,eqa->ea", fe.jxw, fe.p2_val, adv_a)
    scal = mass_d / dt + theta * nu * stiff_d + theta * conv_d
    eye = jnp.eye(fe.dim, dtype=scal.dtype)
    B = scal[:, :, None, None] * eye
    if params.use_supg:
        tau = _supg_tau(fe, params, ustar_q)
        test = tau[:, :, None] * adv_a
        op_a = fe.p2_val[None, :, :] / dt + adv_a
        B = B + jnp.einsum("eq,eqa,eqa->ea", fe.jxw, test, op_a)[:, :, None, None] * eye
        B = B + params.gamma * jnp.einsum("eq,eqad,eqaf->eadf", fe.jxw, g2, g2)
    return B


def invert_spd_blocks(B):
    """Closed-form inverse of batched 2x2 / 3x3 blocks (adjugate rule)."""
    d = B.shape[-1]
    if d == 2:
        a, b = B[..., 0, 0], B[..., 0, 1]
        c, e = B[..., 1, 0], B[..., 1, 1]
        det = a * e - b * c
        inv = jnp.stack(
            [jnp.stack([e, -b], -1), jnp.stack([-c, a], -1)], -2
        ) / det[..., None, None]
        return inv
    c00 = B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1]
    c01 = B[..., 0, 2] * B[..., 2, 1] - B[..., 0, 1] * B[..., 2, 2]
    c02 = B[..., 0, 1] * B[..., 1, 2] - B[..., 0, 2] * B[..., 1, 1]
    c10 = B[..., 1, 2] * B[..., 2, 0] - B[..., 1, 0] * B[..., 2, 2]
    c11 = B[..., 0, 0] * B[..., 2, 2] - B[..., 0, 2] * B[..., 2, 0]
    c12 = B[..., 0, 2] * B[..., 1, 0] - B[..., 0, 0] * B[..., 1, 2]
    c20 = B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0]
    c21 = B[..., 0, 1] * B[..., 2, 0] - B[..., 0, 0] * B[..., 2, 1]
    c22 = B[..., 0, 0] * B[..., 1, 1] - B[..., 0, 1] * B[..., 1, 0]
    det = B[..., 0, 0] * c00 + B[..., 0, 1] * c10 + B[..., 0, 2] * c20
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def newton_blocks(
    fe: FEArrays,
    params: StepParams,
    u_cur,  # (n_vnodes, dim) current Newton iterate
    p_cur,  # (n_p,)
    u_old,
    f_new_q: Optional[Any] = None,
    f_old_q: Optional[Any] = None,
):
    """Physical blocks + RHS of the Newton system (reference: cpp:278-539);
    see :func:`oseen_blocks` for the block shapes (cross_vv is always
    present here; returns an extra ``b_p (n_el, n1)`` pressure-row RHS)."""
    g2 = fe.phys_grads_p2()
    ucur_e = fe.gather_u(u_cur)
    uold_e = fe.gather_u(u_old)
    ucur_q = _interp_u(fe, ucur_e)
    uold_q = _interp_u(fe, uold_e)
    gradu_q = _interp_grad_u(fe, g2, ucur_e)  # G[d,k] = d u_d / d x_k
    graduold_q = _interp_grad_u(fe, g2, uold_e)
    p_e = p_cur[fe.elems_p1]
    p_q = jnp.einsum("qc,ec->eq", fe.p1_val, p_e)
    g1 = fe.phys_grads_p1()  # (n_el, n1, dim)
    # grad p is constant per element for P1.
    gradp_q = jnp.broadcast_to(
        jnp.einsum("ec,ecd->ed", p_e, g1)[:, None, :], ucur_q.shape
    )

    dt, theta, nu = params.dt, params.theta, params.nu

    adv_b = jnp.einsum("eqd,eqbd->eqb", ucur_q, g2)  # (u_k . grad) phi_b

    mass = jnp.einsum("eq,qa,qb->eab", fe.jxw, fe.p2_val, fe.p2_val)
    stiff = jnp.einsum("eq,eqad,eqbd->eab", fe.jxw, g2, g2)
    conv = jnp.einsum("eq,qa,eqb->eab", fe.jxw, fe.p2_val, adv_b)
    diag_vv = mass / dt + theta * nu * stiff + theta * conv
    # Linearized convection second term: theta (G phi_b e_f . phi_a e_d)
    #   = theta G[d, f] phi_a phi_b  -> component-coupling block.
    cross_vv = theta * jnp.einsum("eq,eqdf,qa,qb->eadbf", fe.jxw, gradu_q, fe.p2_val, fe.p2_val)

    A_vp, A_pv = _divergence_blocks(fe, g2)

    # --- residual RHS = -R (reference: cpp:377-418) ----------------------
    conv_cur = jnp.einsum("eqdk,eqk->eqd", gradu_q, ucur_q)
    conv_old = jnp.einsum("eqdk,eqk->eqd", graduold_q, uold_q)
    div_u_q = jnp.einsum("eqdd->eq", gradu_q)

    time_term = (ucur_q - uold_q) / dt
    impl = theta * conv_cur
    expl = (1.0 - theta) * conv_old
    b_v = -jnp.einsum("eq,eqd,qa->ead", fe.jxw, time_term + impl + expl, fe.p2_val)
    b_v -= theta * nu * jnp.einsum("eq,eqdk,eqak->ead", fe.jxw, gradu_q, g2)
    b_v -= (1.0 - theta) * nu * jnp.einsum("eq,eqdk,eqak->ead", fe.jxw, graduold_q, g2)
    # +(p_k, div phi): pres_term enters rhs with opposite sign.
    b_v += jnp.einsum("eq,eq,eqad->ead", fe.jxw, p_q, g2)
    # pressure test rows: +(psi_i, div u_k).
    b_p = jnp.einsum("eq,eq,qc->ec", fe.jxw, div_u_q, fe.p1_val)

    f_theta = None
    if f_new_q is not None:
        f_theta = theta * f_new_q + (1.0 - theta) * f_old_q
        b_v += jnp.einsum("eq,eqd,qa->ead", fe.jxw, f_theta, fe.p2_val)

    if params.use_supg:
        tau = _supg_tau(fe, params, ucur_q)
        test = tau[:, :, None] * jnp.einsum("eqd,eqad->eqa", ucur_q, g2)
        # Jacobian: (test_a e_d, phi_b/dt + (u_k.grad)phi_b + G phi_b + grad psi)
        op_b = fe.p2_val[None, :, :] / dt + adv_b
        diag_vv += jnp.einsum("eq,eqa,eqb->eab", fe.jxw, test, op_b)
        cross_vv += jnp.einsum("eq,eqa,eqdf,qb->eadbf", fe.jxw, test, gradu_q, fe.p2_val)
        s_a = jnp.einsum("eq,eqa->ea", fe.jxw, test)
        A_vp = A_vp + jnp.einsum("ea,ecd->eadc", s_a, g1)
        # grad-div LHS (reference: cpp:461-465).
        cross_vv += params.gamma * jnp.einsum("eq,eqad,eqbf->eadbf", fe.jxw, g2, g2)
        # Strong residual for the SUPG RHS (needs velocity Laplacians;
        # reference: cpp:487-509).
        lap2 = fe.phys_laplacians_p2()  # (n_el, n2)
        # Laplacian of a P2 field is constant per element.
        lapu_q = jnp.broadcast_to(
            jnp.einsum("ea,ead->ed", lap2, ucur_e)[:, None, :], ucur_q.shape
        )
        strong = time_term + conv_cur + gradp_q - nu * lapu_q
        if f_theta is not None:
            strong = strong - f_theta
        b_v -= jnp.einsum("eq,eqa,eqd->ead", fe.jxw, test, strong)

    return diag_vv, cross_vv, A_vp, A_pv, b_v, b_p


def newton_system(
    fe: FEArrays,
    params: StepParams,
    u_cur,  # (n_vnodes, dim) current Newton iterate
    p_cur,  # (n_p,)
    u_old,
    f_new_q: Optional[Any] = None,
    f_old_q: Optional[Any] = None,
):
    """Newton Jacobian and residual RHS (= -R) (reference: cpp:278-539)."""
    diag_vv, cross_vv, A_vp, A_pv, b_v, b_p = newton_blocks(
        fe, params, u_cur, p_cur, u_old, f_new_q, f_old_q
    )
    A_e = _blocks_to_element_matrix(fe, diag_vv, cross_vv, A_vp, A_pv)
    bv = jnp.transpose(b_v, (0, 2, 1)).reshape(fe.n_el, fe.dim * fe.n2)
    b_e = jnp.concatenate([bv, b_p], axis=1)
    return A_e, b_e


def newton_rhs_diag(
    fe: FEArrays,
    params: StepParams,
    u_cur,  # (n_vnodes, dim) current Newton iterate
    p_cur,  # (n_p,)
    u_old,
    f_new_q: Optional[Any] = None,
    f_old_q: Optional[Any] = None,
):
    """Newton residual RHS and Jacobian diagonal WITHOUT the matrices.

    The quadrature-path Newton iteration (matfree operator + Jacobi/Chebyshev
    preconditioning) consumes :func:`newton_system`'s ``(nd, nd)`` element
    matrices only for their diagonal — forming the dense cross-coupling
    blocks (the ``(n2, dim, n2, dim)`` einsums) dominates each Newton
    iteration's assembly cost.  This computes exactly
    ``(diagonal(A_e), b_e)`` of :func:`newton_system` (same weak form,
    reference: NavierStokes.cpp:353-511); equality is asserted in
    tests/test_assembly.py.

    Returns ``(diag_e (n_el, nd), b_e (n_el, nd))`` component-major
    (pressure diagonal is zero: A_pp = 0; pressure RHS rows carry the
    continuity residual).
    """
    g2 = fe.phys_grads_p2()
    ucur_e = fe.gather_u(u_cur)
    uold_e = fe.gather_u(u_old)
    ucur_q = _interp_u(fe, ucur_e)
    uold_q = _interp_u(fe, uold_e)
    gradu_q = _interp_grad_u(fe, g2, ucur_e)
    graduold_q = _interp_grad_u(fe, g2, uold_e)
    p_e = p_cur[fe.elems_p1]
    p_q = jnp.einsum("qc,ec->eq", fe.p1_val, p_e)
    g1 = fe.phys_grads_p1()
    gradp_q = jnp.broadcast_to(
        jnp.einsum("ec,ecd->ed", p_e, g1)[:, None, :], ucur_q.shape
    )

    dt, theta, nu = params.dt, params.theta, params.nu

    adv_a = jnp.einsum("eqd,eqad->eqa", ucur_q, g2)  # (u_k . grad) phi_a

    # --- Jacobian diagonal (a == b, d == f of cpp:421-437) ---------------
    mass_d = jnp.einsum("eq,qa,qa->ea", fe.jxw, fe.p2_val, fe.p2_val)
    stiff_d = jnp.einsum("eq,eqad,eqad->ea", fe.jxw, g2, g2)
    conv_d = jnp.einsum("eq,qa,eqa->ea", fe.jxw, fe.p2_val, adv_a)
    diag_common = mass_d / dt + theta * nu * stiff_d + theta * conv_d
    # Linearized-reaction diagonal: theta G[d, d] phi_a^2 (cpp:428-429).
    gdd = jnp.einsum("eqdd->eqd", gradu_q)  # (n_el, nq, dim)
    phi2 = fe.p2_val * fe.p2_val  # (nq, n2)
    diag_vd = diag_common[:, :, None] + theta * jnp.einsum(
        "eq,eqd,qa->ead", fe.jxw, gdd, phi2
    )

    # --- residual RHS = -R (identical formulas to newton_system) ---------
    conv_cur = jnp.einsum("eqdk,eqk->eqd", gradu_q, ucur_q)
    conv_old = jnp.einsum("eqdk,eqk->eqd", graduold_q, uold_q)
    div_u_q = jnp.einsum("eqdd->eq", gradu_q)

    time_term = (ucur_q - uold_q) / dt
    impl = theta * conv_cur
    expl = (1.0 - theta) * conv_old
    b_v = -jnp.einsum("eq,eqd,qa->ead", fe.jxw, time_term + impl + expl, fe.p2_val)
    b_v -= theta * nu * jnp.einsum("eq,eqdk,eqak->ead", fe.jxw, gradu_q, g2)
    b_v -= (1.0 - theta) * nu * jnp.einsum("eq,eqdk,eqak->ead", fe.jxw, graduold_q, g2)
    b_v += jnp.einsum("eq,eq,eqad->ead", fe.jxw, p_q, g2)
    b_p = jnp.einsum("eq,eq,qc->ec", fe.jxw, div_u_q, fe.p1_val)

    f_theta = None
    if f_new_q is not None:
        f_theta = theta * f_new_q + (1.0 - theta) * f_old_q
        b_v += jnp.einsum("eq,eqd,qa->ead", fe.jxw, f_theta, fe.p2_val)

    if params.use_supg:
        tau = _supg_tau(fe, params, ucur_q)
        test = tau[:, :, None] * jnp.einsum("eqd,eqad->eqa", ucur_q, g2)
        # Jacobian diagonal: (test_a, phi_a/dt + (u_k.grad)phi_a) and the
        # SUPG reaction coupling at (b, f) == (a, d); grad-div (d_d phi_a)^2.
        op_a = fe.p2_val[None, :, :] / dt + adv_a
        diag_vd = diag_vd + jnp.einsum("eq,eqa,eqa->ea", fe.jxw, test, op_a)[:, :, None]
        diag_vd = diag_vd + jnp.einsum("eq,eqa,eqd,qa->ead", fe.jxw, test, gdd, fe.p2_val)
        diag_vd = diag_vd + params.gamma * jnp.einsum(
            "eq,eqad,eqad->ead", fe.jxw, g2, g2
        )
        # Strong residual for the SUPG RHS (cpp:487-509).
        lap2 = fe.phys_laplacians_p2()
        lapu_q = jnp.broadcast_to(
            jnp.einsum("ea,ead->ed", lap2, ucur_e)[:, None, :], ucur_q.shape
        )
        strong = time_term + conv_cur + gradp_q - nu * lapu_q
        if f_theta is not None:
            strong = strong - f_theta
        b_v -= jnp.einsum("eq,eqa,eqd->ead", fe.jxw, test, strong)

    diag_v = jnp.transpose(diag_vd, (0, 2, 1)).reshape(fe.n_el, fe.dim * fe.n2)
    diag_e = jnp.concatenate(
        [diag_v, jnp.zeros((fe.n_el, fe.n1), diag_v.dtype)], axis=1
    )
    bv = jnp.transpose(b_v, (0, 2, 1)).reshape(fe.n_el, fe.dim * fe.n2)
    b_e = jnp.concatenate([bv, b_p], axis=1)
    return diag_e, b_e


def extrapolate_advection(u_old, u_old_old, first_order):
    """u* = 2 u^n - u^{n-1} with the reference's 20% growth clamp, or u^n.

    reference: NavierStokes.cpp:662-676.  The clamp is per quadrature point in
    the reference; applying it per node is the natural nodal analog and agrees
    for smooth fields (documented deviation: the reference evaluates the clamp
    at quadrature points after interpolation).
    """
    u_ex = 2.0 * u_old - u_old_old
    norm_ex = jnp.linalg.norm(u_ex, axis=-1, keepdims=True)
    norm_old = jnp.linalg.norm(u_old, axis=-1, keepdims=True)
    clamped = jnp.where((norm_old > 1e-12) & (norm_ex > 1.2 * norm_old), u_old, u_ex)
    return jnp.where(first_order, u_old, clamped)
