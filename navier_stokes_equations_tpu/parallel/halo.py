"""Halo-exchange domain decomposition: the TRUE distributed-memory layout.

The element-sharded SPMD path (``parallel/sharding.py``) replicates DoF
vectors and accumulates with an all-reduce — simple and correct, but its
communication volume is O(n_dofs) per operator application.  This module
implements the scalable layout the reference gets from deal.II's ghosted
vectors (reference: NavierStokes.cpp:205-220 owned/relevant IndexSets,
1053-1056 ghost import, 527-528 compress(add)):

  * elements are partitioned into P contiguous strips along the flow
    direction (channel geometry => each strip borders only its neighbors);
  * every DoF is OWNED by the first strip that touches it, so a strip's
    ghost (halo) DoFs all come from its LEFT neighbor and its boundary-layer
    owned DoFs are read only by its RIGHT neighbor;
  * one operator application communicates two halo-sized messages per
    shard over ICI via ``jax.lax.ppermute`` — the ghost *import* of the
    trial vector (right-moving) and the ghost *export* of accumulated
    partial sums (left-moving, the ``compress(add)``).  Communication
    volume is O(interface), not O(n_dofs).

Static, padded layout (shapes equal across shards so one program serves
all): per-shard owned/halo id lists, element connectivity in local ids, a
local transpose accumulation map (gather+sum — same TPU-native trick as the
single-chip path), and the boundary-layer send list.

The matvec here is the element-matrix operator y = sum_e P_e^T A_e P_e x —
the same operator ``operators.apply_element_matrices`` applies on one chip;
equivalence is asserted in tests/test_halo.py on an 8-device CPU mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fe_arrays import FEArrays, _transpose_map
from ..solvers import preconditioners


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloDecomposition:
    """Static per-shard arrays, stacked along a leading shard axis."""

    # --- data fields (leading dim = n_shards, sharded over the mesh) ----
    owned_ids: Any  # (P, n_own_max) global dof ids, sentinel n_dofs
    elem_dofs_loc: Any  # (P, n_el_loc, nd) local ids into [0, n_loc)
    acc_gather: Any  # (P, n_loc, w) transpose map into (n_el_loc*nd,)
    send_idx: Any  # (P, n_halo_max) owned-local positions read by the right neighbor
    n_own: Any  # (P,) actual owned counts
    elem_slice: Any  # (P, n_el_loc) global element ids (sentinel n_el)

    # --- static metadata -------------------------------------------------
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    n_own_max: int = dataclasses.field(metadata=dict(static=True))
    n_halo_max: int = dataclasses.field(metadata=dict(static=True))
    n_el_loc: int = dataclasses.field(metadata=dict(static=True))
    n_dofs: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(default="shard", metadata=dict(static=True))

    @property
    def n_loc(self) -> int:
        return self.n_own_max + self.n_halo_max


def geometric_strips(centroids: np.ndarray, n_shards: int) -> list:
    """Equal-WIDTH strips along the longest coordinate axis.

    Unlike equal-count strips, geometric strips are never thinner than the
    elements near them (bin width >> max element size for benchmark
    geometries), so the one-hop halo property holds on strongly graded
    meshes too.  Counts are imbalanced; the decomposition pads each strip
    to the largest one with inert slots.
    """
    axis = int(np.argmax(centroids.max(axis=0) - centroids.min(axis=0)))
    c = centroids[:, axis]
    lo, hi = c.min(), c.max() + 1e-12
    bins = np.minimum(((c - lo) / (hi - lo) * n_shards).astype(np.int64), n_shards - 1)
    strips = [np.where(bins == s)[0] for s in range(n_shards)]
    if any(len(s) == 0 for s in strips):
        raise ValueError("empty geometric strip — fewer shards or refine the mesh")
    return strips


def build_halo_decomposition(
    fe: FEArrays, n_shards: int, axis: str = "shard", strips=None
) -> HaloDecomposition:
    """Host-side construction.

    ``strips``: optional list of per-shard element-id arrays (e.g. from
    :func:`geometric_strips` for graded meshes); defaults to contiguous
    equal-count slices, which are geometric strips when the elements were
    ordered by ``sharding.partition_mesh`` on a quasi-uniform mesh.  Raises
    if any shard would need halo from a non-left neighbor (the one-hop
    strip property does not hold).
    """
    elem_dofs = np.asarray(fe.elem_dofs)
    n_el, nd = elem_dofs.shape
    n_dofs = fe.n_dofs

    # Padded elements (|det J| = 0, appended by pad_elements) reference node
    # 0 wherever it lives; exclude them from ownership/halo and point their
    # local connectivity at this shard's first owned dof (contributions are
    # identically zero).
    pad_elem = np.asarray(fe.jxw).sum(axis=1) == 0.0

    if strips is None:
        if n_el % n_shards:
            raise ValueError(f"n_el={n_el} not divisible by {n_shards} shards")
        step = n_el // n_shards
        strips = [np.arange(s * step, (s + 1) * step) for s in range(n_shards)]
    strips = [np.asarray(s, np.int64) for s in strips]
    n_el_loc = max(len(s) for s in strips)

    owner = np.full(n_dofs, -1, np.int64)
    touched = []
    for s in range(n_shards):
        ids = strips[s]
        real = elem_dofs[ids][~pad_elem[ids]]
        dofs_s = np.unique(real) if len(real) else np.zeros((0,), np.int64)
        touched.append(dofs_s)
        newly = dofs_s[owner[dofs_s] < 0]
        owner[newly] = s
    # Dofs touched only by padded elements (none in practice) -> shard 0.
    owner[owner < 0] = 0

    owned = [np.where(owner == s)[0] for s in range(n_shards)]
    halos = []
    for s in range(n_shards):
        h = touched[s][owner[touched[s]] != s]
        if len(h) and not (owner[h] == s - 1).all():
            raise ValueError(
                "halo crosses more than one strip boundary — element order "
                "is not a contiguous strip partition"
            )
        halos.append(h)

    n_own_max = max(len(o) for o in owned)
    n_halo_max = max((len(h) for h in halos), default=1) or 1

    owned_ids = np.full((n_shards, n_own_max), n_dofs, np.int32)
    send_idx = np.zeros((n_shards, n_halo_max), np.int32)
    elem_dofs_loc = np.zeros((n_shards, n_el_loc, nd), np.int32)
    acc_w = 0
    acc_list = []
    n_loc = n_own_max + n_halo_max
    for s in range(n_shards):
        owned_ids[s, : len(owned[s])] = owned[s]
        # Local id: owned dofs at their position in owned[s], halo dofs after.
        loc_of = {int(d): i for i, d in enumerate(owned[s])}
        for i, d in enumerate(halos[s]):
            loc_of[int(d)] = n_own_max + i
        ids = strips[s]
        eds = elem_dofs[ids].copy()
        eds[pad_elem[ids]] = owned[s][0] if len(owned[s]) else 0
        loc = np.vectorize(lambda d: loc_of.get(int(d), 0))(eds)
        # Per-strip padding (geometric strips have unequal counts): inert
        # slots point at a trash id one past the local space — their (zero)
        # contributions are dropped by trimming the transpose map, and the
        # x-gather clamp makes the forward read harmless (A rows are zero).
        elem_dofs_loc[s, : len(ids)] = loc
        elem_dofs_loc[s, len(ids) :] = n_loc
        # The right neighbor's halo dofs are owned here: record their
        # positions in MY owned list, in the right neighbor's halo order.
        if s + 1 < n_shards and len(halos[s + 1]):
            send_idx[s, : len(halos[s + 1])] = [loc_of[int(d)] for d in halos[s + 1]]
        tm = _transpose_map(elem_dofs_loc[s], n_loc + 1)[:n_loc]
        acc_list.append(tm)
        acc_w = max(acc_w, tm.shape[1])
    acc_gather = np.full((n_shards, n_loc, acc_w), n_el_loc * nd, np.int32)
    for s, tm in enumerate(acc_list):
        acc_gather[s, :, : tm.shape[1]] = tm

    elem_slice = np.full((n_shards, n_el_loc), n_el, np.int32)  # sentinel n_el
    for s, ids in enumerate(strips):
        elem_slice[s, : len(ids)] = ids
    n_own = np.array([len(o) for o in owned], np.int32)

    return HaloDecomposition(
        owned_ids=jnp.asarray(owned_ids),
        elem_dofs_loc=jnp.asarray(elem_dofs_loc),
        acc_gather=jnp.asarray(acc_gather),
        send_idx=jnp.asarray(send_idx),
        n_own=jnp.asarray(n_own),
        elem_slice=jnp.asarray(elem_slice),
        n_shards=n_shards,
        n_own_max=n_own_max,
        n_halo_max=n_halo_max,
        n_el_loc=n_el_loc,
        n_dofs=n_dofs,
        axis=axis,
    )


def shard_decomposition(decomp: HaloDecomposition, mesh: Mesh) -> HaloDecomposition:
    """Place every per-shard array with its leading axis over the device mesh."""
    spec = NamedSharding(mesh, P(decomp.axis))
    updates = {}
    for f in dataclasses.fields(decomp):
        if f.metadata.get("static"):
            continue
        updates[f.name] = jax.device_put(getattr(decomp, f.name), spec)
    return dataclasses.replace(decomp, **updates)


def scatter_owned(decomp: HaloDecomposition, x_global):
    """Replicated global vector -> (P, n_own_max) owned blocks (+0 padding)."""
    xg = jnp.concatenate([x_global, jnp.zeros((1,), x_global.dtype)])
    return xg[decomp.owned_ids]


def gather_global(decomp: HaloDecomposition, x_owned):
    """(P, n_own_max) owned blocks -> replicated global vector."""
    flat_ids = decomp.owned_ids.reshape(-1)
    return (
        jnp.zeros((decomp.n_dofs + 1,), x_owned.dtype)
        .at[flat_ids]
        .set(x_owned.reshape(-1))[:-1]
    )


def _right_perm(n, axis_size):
    return [(i, i + 1) for i in range(axis_size - 1)]


def _left_perm(n, axis_size):
    return [(i + 1, i) for i in range(axis_size - 1)]


def halo_matvec(decomp: HaloDecomposition, A_e_loc, elem_dofs_loc, acc_gather, send_idx, x_own):
    """Per-shard body of y = A x (call inside shard_map; all args local).

    x_own: (n_own_max,) this shard's owned values.
    Returns y_own: (n_own_max,) fully accumulated owned result.
    """
    ax = decomp.axis
    n_sh = decomp.n_shards

    # 1. ghost import: boundary-layer owned values -> right neighbor's halo.
    send_vals = x_own[send_idx]  # (n_halo_max,)
    x_halo = jax.lax.ppermute(send_vals, ax, _right_perm(None, n_sh))
    x_loc = jnp.concatenate([x_own, x_halo])

    # 2. local element kernel + transpose-map accumulation (owned + halo rows).
    x_e = x_loc[elem_dofs_loc]  # (n_el_loc, nd)
    y_e = jnp.einsum("eij,ej->ei", A_e_loc, x_e)
    flat = jnp.concatenate([y_e.reshape(-1), jnp.zeros((1,), y_e.dtype)])
    y_loc = flat[acc_gather].sum(axis=1)  # (n_loc,)

    # 3. ghost export (compress(add)): halo partials -> left owner.
    halo_part = y_loc[decomp.n_own_max :]
    recv = jax.lax.ppermute(halo_part, ax, _left_perm(None, n_sh))
    y_own = y_loc[: decomp.n_own_max].at[send_idx].add(recv)
    return y_own


def halo_cahouet_chabard(
    decomp: HaloDecomposition,
    apply_halo,
    fe,
    pops,
    A_e,
    mask_global,
    diag_global,
    dt,
    theta,
    nu,
    rho,
):
    """Cahouet-Chabard preconditioner on the OWNED layout.

    Same three steps as solvers/preconditioners.py (reference:
    NavierStokes.hpp:279-366): Jacobi velocity solve, divergence of the
    correction (taken from the pressure rows of one distributed matvec),
    and the Schur action.  The dense K_p^{-1} is a replicated operation, so
    the pressure residual is gathered to all shards first (dense/coarse
    solves are replicated in distributed AMG stacks too); everything else
    is owned-local.  Demonstration-grade: a production version would apply
    only the divergence block instead of a full matvec.
    """
    n_u = fe.n_udofs
    is_p = jnp.arange(fe.n_dofs) >= n_u
    pinned_p = jnp.zeros((fe.n_dofs,), bool).at[n_u:].set(pops.pin_mask)

    mask_own = scatter_owned(decomp, mask_global.astype(jnp.float32)).reshape(-1) > 0.5
    isp_own = scatter_owned(decomp, is_p.astype(jnp.float32)).reshape(-1) > 0.5
    pin_own = scatter_owned(decomp, pinned_p.astype(jnp.float32)).reshape(-1) > 0.5
    diag_own = scatter_owned(decomp, diag_global).reshape(-1)
    diag_own = jnp.where(jnp.abs(diag_own) > 1e-30, diag_own, 1.0)
    mp_own = scatter_owned(
        decomp, jnp.concatenate([jnp.ones((n_u,), pops.mp_lumped.dtype), pops.mp_lumped])
    ).reshape(-1)
    mp_own = jnp.where(jnp.abs(mp_own) > 1e-30, mp_own, 1.0)

    def precond(r):
        # step 1: Jacobi velocity solve.
        r_u = jnp.where(isp_own, 0.0, r)
        z_u = jnp.where(mask_own, 0.0, r_u / diag_own)
        # step 2: t = r_p - B z_u (pressure rows of one distributed matvec).
        y = apply_halo(A_e, z_u.reshape(decomp.n_shards, decomp.n_own_max)).reshape(-1)
        t = jnp.where(isp_own, r - y, 0.0)
        t_free = jnp.where(pin_own, 0.0, t)
        # step 3: Schur action; the dense solve is replicated.
        t_glob = gather_global(decomp, t_free.reshape(decomp.n_shards, decomp.n_own_max))
        kp_inv_t = preconditioners.apply_kp_inv(pops, t_glob[n_u:])
        kinv_own = scatter_owned(
            decomp, jnp.concatenate([jnp.zeros((n_u,), kp_inv_t.dtype), kp_inv_t])
        ).reshape(-1)
        z_p = -(rho / dt) * kinv_own - (theta * nu) * (t_free / mp_own)
        z_p = jnp.where(pin_own, t, z_p)
        z = jnp.where(isp_own, z_p, z_u)
        return jnp.where(mask_own, r, z)

    return precond


def halo_fgmres(
    decomp: HaloDecomposition,
    device_mesh: Mesh,
    A_e,
    b_global,
    g_global,
    mask_global,
    x0_global=None,
    restart: int = 64,
    maxiter: int = 200,
    rtol: float = 1e-6,
    precond=None,
):
    """Right-preconditioned-free FGMRES over the HALO layout, end to end.

    Only the matvec needs ``shard_map`` (ghost import/export via ppermute);
    the Krylov vector algebra — axpys, CGS2 projections, norms — runs on
    flat (P * n_own_max,) vectors block-sharded over the device mesh, with
    XLA's SPMD partitioner inserting the psum for every dot product (the
    analog of the implicit MPI reductions inside deal.II's GMRES).

    Uses the row-constrained formulation (see ops/operators.py): boundary
    values ride on the initial guess.  Padded owned slots carry zeros and
    are never masked in, so they contribute nothing to any reduction.
    Returns the solution as a replicated global vector.
    """
    from ..solvers import gmres as _gmres

    apply_halo = make_halo_operator(decomp, device_mesh)
    n_flat = decomp.n_shards * decomp.n_own_max
    spec = NamedSharding(device_mesh, P(decomp.axis))

    maskf = mask_global.astype(b_global.dtype)
    mask_own = scatter_owned(decomp, maskf).reshape(-1) > 0.5
    b_own = scatter_owned(decomp, jnp.where(mask_global, g_global, b_global)).reshape(-1)
    x0 = jnp.where(mask_global, g_global, 0.0 if x0_global is None else x0_global)
    x0_own = scatter_owned(decomp, x0).reshape(-1)
    b_own = jax.device_put(b_own, spec)
    x0_own = jax.device_put(x0_own, spec)

    def apply_a(x_flat):
        y = apply_halo(A_e, x_flat.reshape(decomp.n_shards, decomp.n_own_max))
        return jnp.where(mask_own, x_flat, y.reshape(-1))

    res = _gmres.fgmres(
        apply_a, b_own, x0=x0_own, restart=restart, maxiter=maxiter, rtol=rtol,
        precond=precond,
    )
    return gather_global(decomp, res.x.reshape(decomp.n_shards, decomp.n_own_max)), res


def make_halo_operator(decomp: HaloDecomposition, device_mesh: Mesh):
    """Return apply(A_e, x_owned) -> y_owned, shard_mapped over the mesh.

    ``A_e``: (n_el, nd, nd) element matrices (element-axis sharded),
    ``x_owned``: (P, n_own_max).  Each application moves two halo-sized
    ppermute messages per shard — no O(n_dofs) collectives.
    """
    ax = decomp.axis

    def body(A_e, elem_dofs_loc, acc_gather, send_idx, x_own):
        y = halo_matvec(
            decomp,
            A_e[0],
            elem_dofs_loc[0],
            acc_gather[0],
            send_idx[0],
            x_own[0],
        )
        return y[None]

    mapped = jax.shard_map(
        body,
        mesh=device_mesh,
        in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax)),
        out_specs=P(ax),
    )

    def apply(A_e, x_owned):
        # Gather per-strip element matrices (strips may be non-contiguous
        # and unequal; sentinel slots read the appended zero matrix).
        A_pad = jnp.concatenate(
            [A_e, jnp.zeros((1,) + A_e.shape[1:], A_e.dtype)], axis=0
        )
        A_strips = A_pad[decomp.elem_slice]  # (P, n_el_loc, nd, nd)
        return mapped(
            A_strips, decomp.elem_dofs_loc, decomp.acc_gather, decomp.send_idx, x_owned
        )

    return apply
