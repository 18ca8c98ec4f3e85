"""Dirichlet boundary data: masks and time-dependent value vectors.

Replicates the reference's constraint construction (reference:
NavierStokes.cpp:227-253 for the homogeneous Newton constraints and
616-639 for the per-step non-homogeneous ones):

  * all velocity components constrained on inlet (101), walls, cylinder;
  * inlet carries the benchmark profile evaluated at t^{n+1};
  * pressure pinned to zero on the outlet (102) to keep the Schur
    complement nonsingular.

Application order matters at inlet/wall corners: the reference inserts the
inlet values first and lets walls/cylinder overwrite (NavierStokes.cpp:
1124-1134); the profile vanishes there anyway, but we reproduce the order.
The masks are static; only the inlet values are recomputed inside the jitted
step from the (traced) time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh import taylor_hood as th
from ..mesh.taylor_hood import THMesh
from .fe_arrays import FEArrays


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirichletData:
    mask: Any  # (n_dofs,) bool
    inlet_nodes: Any  # (n_in,) int32 velocity node ids on the inlet
    inlet_coords: Any  # (n_in, dim)
    zero_vel_nodes: Any  # (n_zero,) wall + cylinder velocity nodes
    n_vnodes: int = dataclasses.field(metadata=dict(static=True))
    dim: int = dataclasses.field(metadata=dict(static=True))

    def values(self, inlet_profile: Optional[Callable], t) -> jnp.ndarray:
        """(n_dofs,) boundary-value vector g at time t (zero off-boundary)."""
        n_dofs = self.mask.shape[0]
        g = jnp.zeros((n_dofs,), self.inlet_coords.dtype)
        if inlet_profile is not None and self.inlet_nodes.shape[0] > 0:
            vals = inlet_profile(self.inlet_coords, t)  # (n_in, dim)
            for d in range(self.dim):
                g = g.at[d * self.n_vnodes + self.inlet_nodes].set(vals[:, d])
        if self.zero_vel_nodes.shape[0] > 0:
            for d in range(self.dim):
                g = g.at[d * self.n_vnodes + self.zero_vel_nodes].set(0.0)
        return g


def build_dirichlet(mesh: THMesh, fe: FEArrays, dtype=jnp.float32) -> DirichletData:
    dim = mesh.dim
    inlet = mesh.velocity_nodes_of(th.INLET_ID)
    walls = mesh.velocity_nodes_of(th.wall_id(dim))
    cyl = mesh.velocity_nodes_of(th.cylinder_id(dim))
    zero_nodes = np.unique(np.concatenate([walls, cyl])) if (len(walls) + len(cyl)) else np.zeros(0, np.int32)
    p_pin = mesh.pressure_nodes_of(th.OUTLET_ID)

    mask = np.zeros(fe.n_dofs, bool)
    vel_constrained = np.unique(np.concatenate([inlet, zero_nodes])) if (len(inlet) + len(zero_nodes)) else np.zeros(0, np.int32)
    for d in range(dim):
        mask[d * fe.n_vnodes + vel_constrained] = True
    mask[fe.n_udofs + p_pin] = True

    return DirichletData(
        mask=jnp.asarray(mask),
        inlet_nodes=jnp.asarray(inlet.astype(np.int32)),
        inlet_coords=jnp.asarray(mesh.vel_coords[inlet], dtype),
        zero_vel_nodes=jnp.asarray(zero_nodes.astype(np.int32)),
        n_vnodes=fe.n_vnodes,
        dim=dim,
    )


def pressure_pin_mask(mesh: THMesh, fe: FEArrays) -> jnp.ndarray:
    """(n_p,) bool mask of outlet-pinned pressure dofs (preconditioner space)."""
    m = np.zeros(fe.n_p, bool)
    m[mesh.pressure_nodes_of(th.OUTLET_ID)] = True
    return jnp.asarray(m)
