"""Benchmark functionals: drag/lift coefficients and pressure difference.

Replicates the reference exactly:
  * surface stress integral over the cylinder with
    sigma = -p I + rho nu (grad u + grad u^T), force = -int sigma . n dS
    (reference: NavierStokes.cpp:913-1011);
  * Schaefer-Turek normalization C = 2 F / (rho U_mean^2 A) with
    U_mean = (2/3) U_m (2D) or (4/9) U_m (3D), A = D (2D) or D*H (3D);
    drag is F_x in 2D but F_z in 3D (flow direction), lift is F_y
    (reference: NavierStokes.cpp:987-1010);
  * two-point pressure probe, front minus back
    (reference: NavierStokes.cpp:871-912).

All face tables are static; each functional is a handful of einsums that the
compiler fuses into the jitted step (the reference instead re-walks the mesh
every step with FEFaceValues).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CHANNEL_H, CYLINDER_D, mean_velocity_factor
from ..mesh import taylor_hood as th
from ..mesh.taylor_hood import THMesh
from .fe_arrays import FEArrays


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ForceTables:
    """Static tables for the cylinder surface integral."""

    elem: Any  # (nf,) int32
    normals: Any  # (nf, dim)
    jxw: Any  # (nf, nq)
    p2_values: Any  # (nf, nq, n2)
    p2_phys_grads: Any  # (nf, nq, n2, dim)
    p1_values: Any  # (nf, nq, n1)
    dim: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProbeTables:
    """Two-point pressure probe (front, end)."""

    elems: Any  # (2,) int32
    bary: Any  # (2, n1) P1 shape values = barycentric coords


def build_force_tables(mesh: THMesh, fe: FEArrays, dtype=jnp.float32, bid: int | None = None) -> ForceTables:
    """Face tables for boundary ``bid`` (default: the cylinder).

    A missing boundary (e.g. a plain channel without an obstacle) yields
    empty tables; the surface integrals then evaluate to zero.
    """
    dim = mesh.dim
    key = th.cylinder_id(dim) if bid is None else bid
    if key not in mesh.boundary or mesh.boundary[key].num_faces == 0:
        nq = 1
        z = lambda *shape: jnp.zeros(shape, dtype)
        return ForceTables(
            elem=jnp.zeros((0,), jnp.int32),
            normals=z(0, dim),
            jxw=z(0, nq),
            p2_values=z(0, nq, fe.n2),
            p2_phys_grads=z(0, nq, fe.n2, dim),
            p1_values=z(0, nq, fe.n1),
            dim=dim,
        )
    bf = mesh.boundary[key]
    # Physical gradients of the cell P2 basis at the face quadrature points.
    jinv = mesh.jinv[bf.elem]  # (nf, dim, dim)
    gphys = np.einsum("fqak,fkd->fqad", bf.p2_ref_grads, jinv)
    f = lambda a: jnp.asarray(a, dtype)
    return ForceTables(
        elem=jnp.asarray(bf.elem),
        normals=f(bf.normals),
        jxw=f(bf.jxw),
        p2_values=f(bf.p2_values),
        p2_phys_grads=f(gphys),
        p1_values=f(bf.p1_values),
        dim=mesh.dim,
    )


def build_probe_tables(mesh: THMesh) -> ProbeTables:
    """Delta-p probe points (reference: NavierStokes.cpp:874-879)."""
    if mesh.dim == 2:
        pts = [np.array([0.15, 0.2]), np.array([0.25, 0.2])]
    else:
        pts = [np.array([0.205, 0.2, 0.40]), np.array([0.205, 0.2, 0.50])]
    elems, barys = [], []
    for p in pts:
        e, lam = th.locate_point(mesh, p)
        elems.append(e)
        barys.append(lam)
    return ProbeTables(elems=jnp.asarray(elems, jnp.int32), bary=jnp.asarray(np.array(barys)))


def lift_drag(
    fe: FEArrays,
    ft: ForceTables,
    u,  # (n_vnodes, dim)
    p,  # (n_p,)
    nu: float,
    rho: float,
    U_m: float,
):
    """Return (Cd, Cl) with the Schaefer-Turek normalization."""
    dim = ft.dim
    u_e = u[fe.elems_p2[ft.elem]]  # (nf, n2, dim)
    p_e = p[fe.elems_p1[ft.elem]]  # (nf, n1)
    grad_u = jnp.einsum("fqad,fab->fqbd", ft.p2_phys_grads, u_e)  # [b=comp, d=dx]
    p_q = jnp.einsum("fqc,fc->fq", ft.p1_values, p_e)

    # sigma = -p I + rho nu (grad u + grad u^T); force_loc = -(sigma . n).
    sym = grad_u + jnp.swapaxes(grad_u, 2, 3)
    sigma = rho * nu * sym - p_q[:, :, None, None] * jnp.eye(dim, dtype=u.dtype)
    force_q = -jnp.einsum("fqde,fe->fqd", sigma, ft.normals)
    force = jnp.einsum("fq,fqd->d", ft.jxw, force_q)

    u_mean = mean_velocity_factor(dim) * U_m
    ref_area = CYLINDER_D if dim == 2 else CYLINDER_D * CHANNEL_H
    den = 0.5 * rho * u_mean**2 * ref_area
    drag = force[0] / den if dim == 2 else force[2] / den
    lift = force[1] / den
    return drag, lift


def pressure_difference(fe: FEArrays, pt: ProbeTables, p):
    """p(front) - p(end)."""
    vals = jnp.einsum("kc,kc->k", pt.bary.astype(p.dtype), p[fe.elems_p1[pt.elems]])
    return vals[0] - vals[1]


def boundary_flux(fe: FEArrays, ft: ForceTables, u):
    """int_Gamma u . n dS over the faces in ``ft`` (mass-balance checks)."""
    u_e = u[fe.elems_p2[ft.elem]]  # (nf, n2, dim)
    u_q = jnp.einsum("fqa,fad->fqd", ft.p2_values, u_e)
    return jnp.einsum("fq,fqd,fd->", ft.jxw, u_q, ft.normals)
