"""Device-resident finite-element arrays (the jit-facing mesh representation).

Built once on the host from a ``THMesh``; every array has a static shape so
all downstream computations compile once.  This is the TPU-native analog of
the reference's DoFHandler + sparsity setup (reference:
src/classes/NavierStokes.cpp:82-273), except nothing sparse is ever formed:
operators act element-wise (gather -> batched dense kernel -> scatter-add).

Global DoF layout (component-major blocks, mirroring the reference's
component-wise renumbering at NavierStokes.cpp:87-89):

    x = [ u_x (n_vnodes) | u_y (n_vnodes) | (u_z) | p (n_vertices) ]
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.taylor_hood import THMesh
from . import elements as el
from . import quadrature as quad


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FEArrays:
    """Static per-element tables and connectivity, as device arrays."""

    # --- data fields (pytree leaves) -----------------------------------
    elems_p2: Any  # (n_el, n2) int32
    elems_p1: Any  # (n_el, n1) int32
    elem_dofs: Any  # (n_el, nd) int32, component-major local layout
    jinv: Any  # (n_el, dim, dim)
    jxw: Any  # (n_el, nq)
    diameters: Any  # (n_el,) SUPG h (longest edge)
    p2_val: Any  # (nq, n2)
    p2_refg: Any  # (nq, n2, dim)
    p2_refhess: Any  # (n2, dim, dim) constant hessians of P2 shapes
    p1_val: Any  # (nq, n1)
    p1_refg: Any  # (n1, dim)
    qpoints: Any  # (n_el, nq, dim) physical quadrature points
    # Pressure-space element matrices for the preconditioner (static,
    # assembled once; reference: NavierStokes.cpp:468-474, 529-538).
    kp_e: Any  # (n_el, n1, n1) pressure Laplacian (regularized)
    mp_e: Any  # (n_el, n1, n1) pressure mass
    # Transposed assembly maps: for each global dof, the (padded) positions
    # of its contributions in the flattened per-element value array.  Turns
    # every scatter-add into gather+sum — XLA scatters with duplicate
    # indices serialize on TPU (~100x off roofline), gathers vectorize.
    # Padding entries point one past the end (a zero sentinel slot).
    #
    # TPU gather cost is ~7 ns per *slot* (padding included), so the map is
    # bucketed by adjacency class into contiguous dof ranges with their own
    # pad widths: per velocity component, vertex nodes (valence ~6 in 2D,
    # ~20 in 3D) and edge midpoints (exactly <=2 in 2D, ~6 in 3D) differ by
    # 4x — one global width would pad everything to the vertex maximum.
    # Measured on mesh-2D-100: 9.2 ms -> 5.0 ms per accumulation.
    dof_gather: Any  # tuple of (range_len, w_r) int32 maps covering [0, n_dofs)
    p_gather: Any  # tuple of (range_len, w_r) int32 maps covering [0, n_p)
    node_gather: Any  # tuple of maps covering [0, n_vnodes) into (n_el*n2,)

    # --- static metadata ------------------------------------------------
    dim: int = dataclasses.field(metadata=dict(static=True))
    n_el: int = dataclasses.field(metadata=dict(static=True))
    nq: int = dataclasses.field(metadata=dict(static=True))
    n2: int = dataclasses.field(metadata=dict(static=True))
    n1: int = dataclasses.field(metadata=dict(static=True))
    n_vnodes: int = dataclasses.field(metadata=dict(static=True))
    n_p: int = dataclasses.field(metadata=dict(static=True))
    # False on sharded meshes: the transpose maps index across all elements
    # (local to one chip), so SPMD execution uses scatter-add + all-reduce.
    use_gather_scatter: bool = dataclasses.field(default=True, metadata=dict(static=True))
    # True when elems_p2[:, :n1] == elems_p1 (vertices lead the P2 node
    # numbering — the taylor_hood synthesis invariant): velocity AND
    # pressure trial values then ride ONE (n_el, n2)-slot gather of row
    # width dim+1 instead of two gathers (gather cost is per slot).
    # False on the halo layout, whose local node/vertex numberings differ.
    fused_up_gather: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # Optional tile decomposition (ops/tile_operator.py, a pytree) —
    # populated by the solver when config.operator_path == "tile" so it
    # rides the existing (fe, pops) jit-argument contract.  None elsewhere.
    tiles: Any = None

    @property
    def nd(self) -> int:
        return self.dim * self.n2 + self.n1

    @property
    def n_udofs(self) -> int:
        return self.dim * self.n_vnodes

    @property
    def n_dofs(self) -> int:
        return self.n_udofs + self.n_p

    # --- field helpers ---------------------------------------------------
    def split(self, x):
        """Global vector -> (u (n_vnodes, dim), p (n_p,))."""
        u = x[: self.n_udofs].reshape(self.dim, self.n_vnodes).T
        return u, x[self.n_udofs :]

    def join(self, u, p):
        return jnp.concatenate([u.T.reshape(-1), p])

    def gather_u(self, u):
        """(n_vnodes, dim) -> per-element (n_el, n2, dim)."""
        return u[self.elems_p2]

    def phys_grads_p2(self):
        """(n_el, nq, n2, dim) physical gradients of P2 shapes."""
        return jnp.einsum("qak,ekd->eqad", self.p2_refg, self.jinv)

    def phys_grads_p1(self):
        """(n_el, n1, dim) physical gradients of P1 shapes (constant in q)."""
        return jnp.einsum("ck,ekd->ecd", self.p1_refg, self.jinv)

    def phys_laplacians_p2(self):
        """(n_el, n2) physical Laplacians of P2 shapes (constant per element)."""
        C = jnp.einsum("ekd,eld->ekl", self.jinv, self.jinv)
        return jnp.einsum("akl,ekl->ea", self.p2_refhess, C)

    # --- assembly accumulation helpers ---------------------------------
    def accumulate(self, y_e):
        """(n_el, nd) element contributions -> (n_dofs,) global vector.

        The TPU-fast path evaluates the transposed (bucketed) gather maps;
        sharded meshes fall back to scatter-add (XLA inserts the cross-chip
        all-reduce — the analog of compress(add), reference:
        NavierStokes.cpp:527-528).

        TPU gather cost is per padded SLOT, not per byte, so the velocity
        components accumulate TOGETHER through the node-level map with the
        component axis riding free (one slot per (node, element) adjacency
        instead of dim slots) — measured 5.8 -> 2.4 ms per accumulation on
        mesh-2D-100; the win doubles in 3D.
        """
        if not self.use_gather_scatter:
            return jnp.zeros((self.n_dofs,), y_e.dtype).at[self.elem_dofs].add(y_e)
        ndv = self.dim * self.n2
        yv = y_e[:, :ndv].reshape(self.n_el, self.dim, self.n2)
        return self.accumulate_ud(jnp.transpose(yv, (0, 2, 1)), y_e[:, ndv:])

    def accumulate_ud(self, yv_e, yp_e):
        """((n_el, n2, dim) velocity rows, (n_el, n1) pressure rows) ->
        (n_dofs,) global vector, skipping the (d, a)-major element layout
        entirely (the natural layout of the quadrature-path integrands)."""
        if not self.use_gather_scatter:
            y_e = jnp.concatenate(
                [jnp.transpose(yv_e, (0, 2, 1)).reshape(self.n_el, -1), yp_e],
                axis=1,
            )
            return jnp.zeros((self.n_dofs,), y_e.dtype).at[self.elem_dofs].add(y_e)
        u = self.accumulate_nodes(yv_e)  # (n_vnodes, dim)
        p = self.accumulate_p(yp_e)
        return jnp.concatenate([u.T.reshape(-1), p])

    def accumulate_p(self, yp_e):
        """(n_el, n1) pressure-space contributions -> (n_p,)."""
        if not self.use_gather_scatter:
            return jnp.zeros((self.n_p,), yp_e.dtype).at[self.elems_p1].add(yp_e)
        flat = jnp.concatenate([yp_e.reshape(-1), jnp.zeros((1,), yp_e.dtype)])
        return jnp.concatenate([flat[g].sum(axis=1) for g in self.p_gather])

    def accumulate_p_rows(self, y_e):
        """(n_el, n1, k) pressure-space row contributions -> (n_p, k).

        Same bucketed maps as :meth:`accumulate_p`; the trailing dimension
        rides nearly free (TPU gather cost is per slot, not per byte), so k
        velocity components accumulate for the price of one scalar pass —
        used by the P1-coarse velocity preconditioner.
        """
        k = y_e.shape[-1]
        if not self.use_gather_scatter:
            return jnp.zeros((self.n_p, k), y_e.dtype).at[self.elems_p1].add(y_e)
        flat = jnp.concatenate(
            [y_e.reshape(-1, k), jnp.zeros((1, k), y_e.dtype)], axis=0
        )
        return jnp.concatenate([flat[g].sum(axis=1) for g in self.p_gather])

    def accumulate_nodes(self, y_e):
        """(n_el, n2, k) per-node contributions -> (n_vnodes, k).

        Row-gathers of width k (TPU gather cost is per slot, so k rides
        nearly free); used for node-block preconditioner diagonals.
        """
        k = y_e.shape[-1]
        if not self.use_gather_scatter:
            return jnp.zeros((self.n_vnodes, k), y_e.dtype).at[self.elems_p2].add(y_e)
        flat = jnp.concatenate(
            [y_e.reshape(-1, k), jnp.zeros((1, k), y_e.dtype)], axis=0
        )
        return jnp.concatenate([flat[g].sum(axis=1) for g in self.node_gather])


def _transpose_map(elem_entries: np.ndarray, n_targets: int) -> np.ndarray:
    """(n_el, k) target ids -> (n_targets, max_count) padded positions into
    the flattened (n_el * k,) value array; padding = n_el * k (sentinel)."""
    flat = np.asarray(elem_entries, np.int64).ravel()
    order = np.argsort(flat, kind="stable")
    sorted_t = flat[order]
    counts = np.bincount(sorted_t, minlength=n_targets)
    max_c = max(int(counts.max()), 1)
    sentinel = flat.size
    out = np.full((n_targets, max_c), sentinel, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    col = np.arange(flat.size) - starts[sorted_t]
    out[sorted_t, col] = order
    return out


def _adaptive_splits(counts: np.ndarray, min_rows: int = 4096, max_buckets: int = 5):
    """Extra split points inside one contiguous range.

    With valence-clustered node numbering (mesh/taylor_hood.py) the
    adjacency counts are non-increasing inside a range, so greedily starting
    a new bucket whenever the count has dropped to <=3/4 of the current
    bucket's width removes most padding at a bounded number of gathers."""
    splits = []
    if len(counts) == 0:
        return splits
    cur_max = int(counts[0])
    start = 0
    for i in range(len(counts)):
        if (
            len(splits) + 1 < max_buckets
            and i - start >= min_rows
            and counts[i] * 4 <= cur_max * 3
        ):
            splits.append(i)
            start = i
            cur_max = max(int(counts[i]), 1)
    return splits


def _bucketed_transpose_map(
    elem_entries: np.ndarray, n_targets: int, bounds: list[int]
) -> tuple[np.ndarray, ...]:
    """Transpose map split at ``bounds`` into contiguous target ranges, each
    column-trimmed to its own maximum adjacency (entries are left-packed, so
    trimming drops only sentinel padding).  Gather cost is proportional to
    padded slots; dof classes with 4x different valences should not share
    one pad width.  Ranges are further sub-split adaptively along the
    (valence-sorted) count profile.

    Each bucket's block is built DIRECTLY at its own width (never the
    dense (n_targets, global_max) map): callers routinely append a
    sentinel target that collects every pad entry, and materializing the
    full map at that row's width is O(n_targets * n_pads) memory — 284
    GiB on the 855k-dof tile interface maps (the trailing sentinel bucket
    itself is one row and stays cheap)."""
    flat = np.asarray(elem_entries, np.int64).ravel()
    order = np.argsort(flat, kind="stable").astype(np.int64)
    sorted_t = flat[order]
    counts = np.bincount(sorted_t, minlength=n_targets)[:n_targets]
    starts = np.concatenate([[0], np.cumsum(counts)])  # (n_targets + 1,)
    sentinel = flat.size
    edges = sorted({0, n_targets, *(b for b in bounds if 0 < b < n_targets)})
    cut = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        cut.append(lo)
        cut.extend(lo + s for s in _adaptive_splits(counts[lo:hi]))
    cut.append(n_targets)
    parts = []
    for lo, hi in zip(cut[:-1], cut[1:]):
        w = max(int(counts[lo:hi].max()), 1) if hi > lo else 1
        block = np.full((hi - lo, w), sentinel, np.int32)
        s0, s1 = int(starts[lo]), int(starts[hi])
        t_sel = sorted_t[s0:s1]
        col = np.arange(s0, s1) - starts[t_sel]
        block[t_sel - lo, col] = order[s0:s1]
        parts.append(block)
    return tuple(parts)


def build_fe_arrays(mesh: THMesh, n_q1d: int = 3, dtype=jnp.float32) -> FEArrays:
    """Host-side construction of all static tables."""
    dim = mesh.dim
    rule = quad.simplex_rule(dim, n_q1d, compact=True)
    t2 = el.shape_tables(dim, 2, rule.points)
    t1 = el.shape_tables(dim, 1, rule.points)

    jxw = rule.weights[None, :] * mesh.detj[:, None]  # (n_el, nq)

    # Physical quadrature points: x = sum_c p1_val[q,c] * vertex_c.
    verts = mesh.vertices[mesh.elems_p1]  # (n_el, n1, dim)
    qpoints = np.einsum("qc,ecd->eqd", t1.values, verts)

    # Component-major element DoF map.
    n2 = mesh.n_en2
    n1 = mesh.n_en1
    nv = mesh.n_vnodes
    vel_dofs = np.concatenate(
        [d * nv + mesh.elems_p2 for d in range(dim)], axis=1
    )  # (n_el, dim*n2)
    p_dofs = dim * nv + mesh.elems_p1
    elem_dofs = np.concatenate([vel_dofs, p_dofs], axis=1).astype(np.int32)

    # Static pressure-space element matrices (assembled in f64 on the host).
    g1 = np.einsum("ck,ekd->ecd", t1.grads[0], mesh.jinv)  # P1 ref grads const in q
    kp_e = np.einsum("ecd,efd,e->ecf", g1, g1, mesh.detj * rule.weights.sum())
    mp_e = np.einsum("q,qc,qf->cf", rule.weights, t1.values, t1.values)[None] * mesh.detj[:, None, None]

    n_dofs = dim * nv + mesh.n_vertices
    # Bucket boundaries: per component, vertex nodes [d*nv, d*nv + n_vert)
    # vs synthesized edge midpoints [d*nv + n_vert, (d+1)*nv); then pressure.
    bounds = []
    for d in range(dim):
        bounds += [d * nv, d * nv + mesh.n_vertices]
    bounds.append(dim * nv)
    dof_gather = _bucketed_transpose_map(elem_dofs, n_dofs, bounds)
    p_gather = _bucketed_transpose_map(mesh.elems_p1, mesh.n_vertices, [])
    node_gather = _bucketed_transpose_map(mesh.elems_p2, nv, [mesh.n_vertices])

    f = lambda a: jnp.asarray(a, dtype)
    return FEArrays(
        elems_p2=jnp.asarray(mesh.elems_p2),
        elems_p1=jnp.asarray(mesh.elems_p1),
        elem_dofs=jnp.asarray(elem_dofs),
        jinv=f(mesh.jinv),
        jxw=f(jxw),
        diameters=f(mesh.diameters),
        p2_val=f(t2.values),
        p2_refg=f(t2.grads),
        p2_refhess=f(t2.hessians[0]),
        p1_val=f(t1.values),
        p1_refg=f(t1.grads[0]),
        qpoints=f(qpoints),
        kp_e=f(kp_e),
        mp_e=f(mp_e),
        dof_gather=tuple(jnp.asarray(g) for g in dof_gather),
        p_gather=tuple(jnp.asarray(g) for g in p_gather),
        node_gather=tuple(jnp.asarray(g) for g in node_gather),
        dim=dim,
        n_el=mesh.n_el,
        nq=rule.num_points,
        n2=n2,
        n1=n1,
        n_vnodes=nv,
        n_p=mesh.n_vertices,
        fused_up_gather=bool(
            np.array_equal(mesh.elems_p2[:, :n1], mesh.elems_p1)
        ),
    )
