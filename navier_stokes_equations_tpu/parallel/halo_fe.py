"""Node-level halo decomposition: per-strip local FEArrays for the FULL step.

``parallel/halo.py`` demonstrates the O(interface) ppermute layout on the
element-matrix operator.  This module generalizes it to the whole time step:
each strip gets a complete LOCAL ``FEArrays`` (connectivity in local ids,
geometry slices, its own bucketed transpose maps), stacked along a leading
shard axis.  Inside ``shard_map`` the local block is re-wrapped as an
ordinary ``FEArrays``, so every existing kernel — ``assembly.oseen_rhs_diag``,
``matfree.make_system_operator``, ``functionals.lift_drag`` — runs verbatim
on the strip, with ghost import/export wrapped around it.

Ownership is at the NODE level (all velocity components and the collocated
pressure dof of a node share one owner), mirroring deal.II's
locally_owned_dofs partition (reference: NavierStokes.cpp:103-104, 197-220):

  * a node is owned by the first shard whose elements touch it; a shard's
    halo nodes may belong to ANY set of neighbor shards (general
    partitions — RCB, strips, anything `GridTools::partition_triangulation`
    could produce, NavierStokes.cpp:56-61);
  * the local field layout per shard is

        x_loc = [ u_x (n_ln) | u_y (n_ln) | (u_z) | p (n_lp) ]

    with n_ln = n_own_nodes_max + n_halo_nodes_max: owned nodes first
    (ascending global id — the global numbering is valence-clustered, so
    local vertices precede local edge midpoints), halo nodes after, each
    region padded with inert slots so shapes match across shards;
  * the neighbor communication graph is edge-colored host-side into R
    permutation ROUNDS (each shard at most one send and one receive per
    round); one ghost import / export runs R ``jax.lax.ppermute`` steps
    with static per-round send/recv index tables.  Strip partitions color
    to R = 1, reproducing the original one-hop schedule; RCB grids get
    R ~ neighbor degree.  The export is the analog of Trilinos
    compress(add) (reference: NavierStokes.cpp:527-528, 1053-1056).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fe_arrays import FEArrays, _transpose_map


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloFE:
    """Stacked per-strip local FE data + the global<->local index maps."""

    # fe_stack: an FEArrays whose LEAVES are stacked (P, ...) and whose
    # static metadata describes the LOCAL sizes (n_el=n_el_loc,
    # n_vnodes=n_ln, n_p=n_lp).  tree.map(lambda a: a[0], fe_stack) inside a
    # shard_map body yields a plain local FEArrays.
    fe_stack: FEArrays
    owned_nodes: Any  # (P, n_on_max) global node ids, sentinel n_vnodes_glob
    owned_verts: Any  # (P, n_op_max) global vertex ids, sentinel n_p_glob
    # Per-ROUND exchange tables.  send_nodes[p, r, 0] = local OWNED node
    # positions this shard sends in round r (sentinel n_ln -> zero pad);
    # send_nodes[p, r, 1] = local HALO node positions where round r's
    # received values land (sentinel n_ln -> trash slot).  The same table
    # drives the export in reverse (gather at [r,1], add at [r,0]).
    send_nodes: Any  # (P, R, 2, msg_n)
    send_verts: Any  # (P, R, 2, msg_p)
    elem_gids: Any  # (P, n_el_loc) global element id of each local slot (-1 pad)

    n_shards: int = dataclasses.field(metadata=dict(static=True))
    n_on_max: int = dataclasses.field(metadata=dict(static=True))
    n_hn_max: int = dataclasses.field(metadata=dict(static=True))
    n_op_max: int = dataclasses.field(metadata=dict(static=True))
    n_hp_max: int = dataclasses.field(metadata=dict(static=True))
    dim: int = dataclasses.field(metadata=dict(static=True))
    n_vnodes_glob: int = dataclasses.field(metadata=dict(static=True))
    n_p_glob: int = dataclasses.field(metadata=dict(static=True))
    # Edge-colored communication schedule: comm_pairs[r] is the (src, dst)
    # permutation of ppermute round r (strips: one round of (i, i+1) pairs).
    comm_pairs: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    axis: str = dataclasses.field(default="shard", metadata=dict(static=True))

    @property
    def n_ln(self) -> int:  # local velocity-node space
        return self.n_on_max + self.n_hn_max

    @property
    def n_lp(self) -> int:  # local pressure space
        return self.n_op_max + self.n_hp_max

    @property
    def n_ld(self) -> int:  # local dof space
        return self.dim * self.n_ln + self.n_lp

    @property
    def n_rounds(self) -> int:
        return len(self.comm_pairs)

    def pairs(self, r):
        """Round-r import permutation (owner -> halo reader)."""
        return list(self.comm_pairs[r])

    def rev_pairs(self, r):
        """Round-r export permutation (halo partials back to the owner)."""
        return [(d, s) for (s, d) in self.comm_pairs[r]]


def _color_rounds(edges):
    """Greedy edge coloring of the directed communication graph.

    Each round is a partial permutation: every shard appears at most once
    as src and at most once as dst (the ppermute contract).  Strip graphs
    ((s-1) -> s for all s) color to exactly one round.
    """
    rounds = []  # list of (pairs, srcs_used, dsts_used)
    for (src, dst) in sorted(edges):
        for pairs, srcs, dsts in rounds:
            if src not in srcs and dst not in dsts:
                pairs.append((src, dst))
                srcs.add(src)
                dsts.add(dst)
                break
        else:
            rounds.append(([(src, dst)], {src}, {dst}))
    return [tuple(pairs) for pairs, _, _ in rounds]


def _stacked_bucketed_maps(per_strip_entries, n_targets, bounds):
    """Per-strip transpose maps with UNIFIED bucket widths (stackable).

    ``bounds``: static split points of the target range, identical across
    strips (the strip-varying vertex/edge boundary cannot be used here, so
    buckets are the fixed owned/halo regions).  Returns a tuple of
    (P, range_len, w_bucket) arrays.
    """
    P = len(per_strip_entries)
    edges = sorted({0, n_targets, *(b for b in bounds if 0 < b < n_targets)})
    fulls, counts = [], []
    for s in range(P):
        tm = _transpose_map(per_strip_entries[s], n_targets)
        fulls.append(tm)
        sentinel = per_strip_entries[s].size
        counts.append((tm != sentinel).sum(axis=1))
    out = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        w = max(1, max(int(counts[s][lo:hi].max()) if hi > lo else 1 for s in range(P)))
        blocks = []
        for s in range(P):
            sentinel = per_strip_entries[s].size
            blk = np.full((hi - lo, w), sentinel, np.int32)
            src = fulls[s][lo:hi]
            ww = min(w, src.shape[1])
            blk[:, :ww] = src[:, :ww]
            blocks.append(blk)
        out.append(np.stack(blocks))
    return tuple(out)


def build_halo_fe(fe: FEArrays, n_shards: int, strips=None, axis: str = "shard") -> HaloFE:
    """Host-side construction from a GLOBAL (unsharded) FEArrays.

    ``strips``: optional per-shard element-id lists — any partition works
    (``sharding.rcb_partition``, ``halo.geometric_strips``, hand-rolled);
    defaults to contiguous equal-count slices of the (spatially ordered)
    element array.  The neighbor graph is arbitrary; the exchange schedule
    is edge-colored into ppermute rounds.
    """
    elems_p2 = np.asarray(fe.elems_p2)
    elems_p1 = np.asarray(fe.elems_p1)
    jxw = np.asarray(fe.jxw)
    n_el, n2 = elems_p2.shape
    n1 = elems_p1.shape[1]
    dim, nq = fe.dim, fe.nq
    nvg, npg = fe.n_vnodes, fe.n_p
    pad_elem = jxw.sum(axis=1) == 0.0

    if strips is None:
        strips = np.array_split(np.arange(n_el), n_shards)
    strips = [np.asarray(s, np.int64) for s in strips]
    if any(len(s) == 0 for s in strips):
        raise ValueError("empty strip — fewer shards or refine the mesh")
    n_el_loc = max(len(s) for s in strips)

    # --- node ownership: first-touching strip ---------------------------
    owner = np.full(nvg, -1, np.int64)
    touched = []
    for s in range(n_shards):
        ids = strips[s]
        real = elems_p2[ids][~pad_elem[ids]]
        nodes_s = np.unique(real) if len(real) else np.zeros((0,), np.int64)
        touched.append(nodes_s)
        newly = nodes_s[owner[nodes_s] < 0]
        owner[newly] = s
    owner[owner < 0] = 0  # untouched (possible only on all-pad meshes)

    owned = [np.where(owner == s)[0] for s in range(n_shards)]
    # Halo nodes grouped by OWNER shard (ascending global id within each
    # group — both endpoints of an edge agree on the message order).
    halos = [touched[s][owner[touched[s]] != s] for s in range(n_shards)]
    halo_by_owner = [
        {int(t): h[owner[h] == t] for t in np.unique(owner[h])} for h in halos
    ]
    edges = [(t, s) for s in range(n_shards) for t in halo_by_owner[s]]
    rounds = _color_rounds(edges)

    n_on_max = max(len(o) for o in owned)
    n_hn_max = max((len(h) for h in halos), default=1) or 1
    owned_v = [o[o < npg] for o in owned]
    halo_v = [h[h < npg] for h in halos]
    n_op_max = max(len(o) for o in owned_v)
    n_hp_max = max((len(h) for h in halo_v), default=1) or 1
    n_ln = n_on_max + n_hn_max
    n_lp = n_op_max + n_hp_max
    n_ld = dim * n_ln + n_lp

    # Per-round message widths: the largest single edge message (nodes /
    # pressure verts), shared by all rounds for static shapes.
    msg_n = max((len(h) for hb in halo_by_owner for h in hb.values()), default=1) or 1
    msg_p = max(
        (int((h < npg).sum()) for hb in halo_by_owner for h in hb.values()), default=1
    ) or 1
    n_rounds = max(len(rounds), 1)

    owned_nodes = np.full((n_shards, n_on_max), nvg, np.int32)
    owned_verts = np.full((n_shards, n_op_max), npg, np.int32)
    # Sentinels: n_ln / n_lp point one past the local region — the exchange
    # primitives extend the vector by a trash slot.
    send_nodes = np.full((n_shards, n_rounds, 2, msg_n), n_ln, np.int32)
    send_verts = np.full((n_shards, n_rounds, 2, msg_p), n_lp, np.int32)

    elems_p2_loc = np.zeros((n_shards, n_el_loc, n2), np.int32)
    elems_p1_loc = np.zeros((n_shards, n_el_loc, n1), np.int32)
    elem_gids = np.full((n_shards, n_el_loc), -1, np.int32)
    geo = {
        "jxw": np.zeros((n_shards, n_el_loc, nq)),
        "jinv": np.broadcast_to(np.eye(dim), (n_shards, n_el_loc, dim, dim)).copy(),
        "diameters": np.ones((n_shards, n_el_loc)),
        "qpoints": np.zeros((n_shards, n_el_loc, nq, dim)),
        "kp_e": np.zeros((n_shards, n_el_loc, n1, n1)),
        "mp_e": np.zeros((n_shards, n_el_loc, n1, n1)),
    }
    src = {k: np.asarray(getattr(fe, k)) for k in geo}

    loc_node_maps = []
    loc_vert_maps = []
    for s in range(n_shards):
        owned_nodes[s, : len(owned[s])] = owned[s]
        owned_verts[s, : len(owned_v[s])] = owned_v[s]
        loc = np.full(nvg, -1, np.int64)
        loc[owned[s]] = np.arange(len(owned[s]))
        loc[halos[s]] = n_on_max + np.arange(len(halos[s]))
        locp = np.full(npg, -1, np.int64)
        locp[owned_v[s]] = np.arange(len(owned_v[s]))
        locp[halo_v[s]] = n_op_max + np.arange(len(halo_v[s]))
        loc_node_maps.append(loc)
        loc_vert_maps.append(locp)

        ids = strips[s]
        e2 = elems_p2[ids].copy()
        e1 = elems_p1[ids].copy()
        # Globally padded elements (|det J|=0) reference node 0, which may
        # not be local here: point them at local 0 (contributions vanish).
        e2[pad_elem[ids]] = owned[s][0] if len(owned[s]) else 0
        e1[pad_elem[ids]] = owned_v[s][0] if len(owned_v[s]) else 0
        elems_p2_loc[s, : len(ids)] = loc[e2]
        elems_p1_loc[s, : len(ids)] = locp[e1]
        elem_gids[s, : len(ids)] = ids
        # Strip pad slots keep local id 0 with jxw=0 — inert.
        for k in geo:
            geo[k][s, : len(ids)] = src[k][ids]

    # Exchange tables: for edge (t -> s) in round r, sender t reads its
    # OWNED positions ([r, 0]), receiver s writes its HALO positions
    # ([r, 1]); both sides list the same global ids in the same (ascending)
    # order, so the message needs no header.
    for r, pairs in enumerate(rounds):
        for (t, s) in pairs:
            h = halo_by_owner[s][t]
            hv = h[h < npg]
            send_nodes[t, r, 0, : len(h)] = loc_node_maps[t][h]
            send_nodes[s, r, 1, : len(h)] = loc_node_maps[s][h]
            send_verts[t, r, 0, : len(hv)] = loc_vert_maps[t][hv]
            send_verts[s, r, 1, : len(hv)] = loc_vert_maps[s][hv]

    # --- local component-major elem_dofs + stacked transpose maps -------
    vel_dofs = np.concatenate(
        [d * n_ln + elems_p2_loc for d in range(dim)], axis=2
    )  # (P, n_el_loc, dim*n2)
    p_dofs = dim * n_ln + elems_p1_loc
    elem_dofs_loc = np.concatenate([vel_dofs, p_dofs], axis=2).astype(np.int32)

    bounds_dof = []
    for d in range(dim):
        bounds_dof += [d * n_ln, d * n_ln + n_on_max]
    bounds_dof += [dim * n_ln, dim * n_ln + n_op_max]
    dof_gather = _stacked_bucketed_maps(list(elem_dofs_loc), n_ld, bounds_dof)
    p_gather = _stacked_bucketed_maps(list(elems_p1_loc), n_lp, [n_op_max])
    node_gather = _stacked_bucketed_maps(list(elems_p2_loc), n_ln, [n_on_max])

    dtype = np.asarray(fe.jxw).dtype
    f = lambda a: jnp.asarray(a, dtype)
    rep = lambda a: jnp.broadcast_to(jnp.asarray(a)[None], (n_shards,) + jnp.asarray(a).shape)
    fe_stack = FEArrays(
        elems_p2=jnp.asarray(elems_p2_loc),
        elems_p1=jnp.asarray(elems_p1_loc),
        elem_dofs=jnp.asarray(elem_dofs_loc),
        jinv=f(geo["jinv"]),
        jxw=f(geo["jxw"]),
        diameters=f(geo["diameters"]),
        p2_val=rep(fe.p2_val),
        p2_refg=rep(fe.p2_refg),
        p2_refhess=rep(fe.p2_refhess),
        p1_val=rep(fe.p1_val),
        p1_refg=rep(fe.p1_refg),
        qpoints=f(geo["qpoints"]),
        kp_e=f(geo["kp_e"]),
        mp_e=f(geo["mp_e"]),
        dof_gather=tuple(jnp.asarray(g) for g in dof_gather),
        p_gather=tuple(jnp.asarray(g) for g in p_gather),
        node_gather=tuple(jnp.asarray(g) for g in node_gather),
        dim=dim,
        n_el=n_el_loc,
        nq=nq,
        n2=n2,
        n1=n1,
        n_vnodes=n_ln,
        n_p=n_lp,
    )
    return HaloFE(
        fe_stack=fe_stack,
        owned_nodes=jnp.asarray(owned_nodes),
        owned_verts=jnp.asarray(owned_verts),
        send_nodes=jnp.asarray(send_nodes),
        send_verts=jnp.asarray(send_verts),
        elem_gids=jnp.asarray(elem_gids),
        n_shards=n_shards,
        n_on_max=n_on_max,
        n_hn_max=n_hn_max,
        n_op_max=n_op_max,
        n_hp_max=n_hp_max,
        dim=dim,
        n_vnodes_glob=nvg,
        n_p_glob=npg,
        comm_pairs=tuple(
            tuple((int(t), int(s)) for (t, s) in pairs) for pairs in rounds
        ),
        axis=axis,
    )


def shard_halo_fe(hfe: HaloFE, device_mesh) -> HaloFE:
    """Place every stacked array with its leading axis over the device mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = NamedSharding(device_mesh, P(hfe.axis))
    put = lambda a: jax.device_put(a, spec)
    return dataclasses.replace(
        hfe,
        fe_stack=jax.tree.map(put, hfe.fe_stack),
        owned_nodes=put(hfe.owned_nodes),
        owned_verts=put(hfe.owned_verts),
        send_nodes=put(hfe.send_nodes),
        send_verts=put(hfe.send_verts),
        elem_gids=put(hfe.elem_gids),
    )


# ---------------------------------------------------------------------------
# Global <-> local layout transforms (outside shard_map; XLA SPMD handles the
# sharded/replicated mix — scatter_local is per-shard gathers, gather_local a
# unique-index scatter).
# ---------------------------------------------------------------------------

def scatter_local(hfe: HaloFE, x_global):
    """(n_dofs_glob,) replicated -> (P, n_ld) owned blocks; halo slots zero."""
    dim, nvg = hfe.dim, hfe.n_vnodes_glob
    u = x_global[: dim * nvg].reshape(dim, nvg)
    u = jnp.concatenate([u, jnp.zeros((dim, 1), u.dtype)], axis=1)
    u_own = u[:, hfe.owned_nodes]  # (dim, P, n_on_max)
    u_own = jnp.moveaxis(u_own, 1, 0)  # (P, dim, n_on_max)
    u_loc = jnp.concatenate(
        [u_own, jnp.zeros((hfe.n_shards, dim, hfe.n_hn_max), u_own.dtype)], axis=2
    ).reshape(hfe.n_shards, dim * hfe.n_ln)
    p = jnp.concatenate([x_global[dim * nvg :], jnp.zeros((1,), x_global.dtype)])
    p_own = p[hfe.owned_verts]  # (P, n_op_max)
    p_loc = jnp.concatenate(
        [p_own, jnp.zeros((hfe.n_shards, hfe.n_hp_max), p_own.dtype)], axis=1
    )
    return jnp.concatenate([u_loc, p_loc], axis=1)


def gather_local(hfe: HaloFE, x_loc):
    """(P, n_ld) owned blocks -> (n_dofs_glob,) replicated global vector."""
    dim, nvg, npg = hfe.dim, hfe.n_vnodes_glob, hfe.n_p_glob
    u_part = x_loc[:, : dim * hfe.n_ln].reshape(hfe.n_shards, dim, hfe.n_ln)
    u_own = u_part[:, :, : hfe.n_on_max]  # (P, dim, n_on_max)
    ids = hfe.owned_nodes.reshape(-1)
    u_glob = (
        jnp.zeros((dim, nvg + 1), x_loc.dtype)
        .at[:, ids]
        .set(jnp.moveaxis(u_own, 1, 0).reshape(dim, -1))[:, :-1]
    )
    p_own = x_loc[:, dim * hfe.n_ln : dim * hfe.n_ln + hfe.n_op_max]
    p_glob = (
        jnp.zeros((npg + 1,), x_loc.dtype)
        .at[hfe.owned_verts.reshape(-1)]
        .set(p_own.reshape(-1))[:-1]
    )
    return jnp.concatenate([u_glob.reshape(-1), p_glob])


# ---------------------------------------------------------------------------
# Ghost exchange (INSIDE a shard_map body; operands are this shard's blocks).
# ---------------------------------------------------------------------------

def import_halo(hfe: HaloFE, x, send_nodes, send_verts):
    """Fill the halo slots of a local flat vector from their owners.

    R ppermute rounds of (dim*msg_n + msg_p,) values — the ghost import of
    deal.II's ghosted-vector assignment (cpp:1053-1056).  Strip partitions
    have R = 1.  ``send_nodes``/``send_verts``: this shard's (R, 2, msg)
    tables (send positions at [:, 0], recv positions at [:, 1]; sentinel
    one past the local region lands in a trash slot).
    """
    dim, n_ln, n_lp = hfe.dim, hfe.n_ln, hfe.n_lp
    msg_n = send_nodes.shape[-1]
    u = x[: dim * n_ln].reshape(dim, n_ln)
    p = x[dim * n_ln :]
    # Trash slot at index n_ln / n_lp absorbs sentinel reads and writes.
    u = jnp.concatenate([u, jnp.zeros((dim, 1), u.dtype)], axis=1)
    p = jnp.concatenate([p, jnp.zeros((1,), p.dtype)])
    for r in range(hfe.n_rounds):
        msg = jnp.concatenate(
            [u[:, send_nodes[r, 0]].reshape(-1), p[send_verts[r, 0]]]
        )
        recv = jax.lax.ppermute(msg, hfe.axis, hfe.pairs(r))
        ru = recv[: dim * msg_n].reshape(dim, msg_n)
        rp = recv[dim * msg_n :]
        u = u.at[:, send_nodes[r, 1]].set(ru)
        p = p.at[send_verts[r, 1]].set(rp)
    return jnp.concatenate([u[:, :n_ln].reshape(-1), p[:n_lp]])


def export_halo(hfe: HaloFE, y, send_nodes, send_verts):
    """Add this shard's halo partials into their owners; zero the halo.

    R ppermute rounds on the reversed schedule — the compress(add) of the
    reference (cpp:527-528).  Partials are gathered at the recv positions
    ([r, 1]) and accumulated at the owner's owned positions ([r, 0]);
    sentinel entries ride the trash slot.
    """
    dim, n_ln, n_lp = hfe.dim, hfe.n_ln, hfe.n_lp
    msg_n = send_nodes.shape[-1]
    u = y[: dim * n_ln].reshape(dim, n_ln)
    p = y[dim * n_ln :]
    u = jnp.concatenate([u, jnp.zeros((dim, 1), u.dtype)], axis=1)
    p = jnp.concatenate([p, jnp.zeros((1,), p.dtype)])
    for r in range(hfe.n_rounds):
        msg = jnp.concatenate(
            [u[:, send_nodes[r, 1]].reshape(-1), p[send_verts[r, 1]]]
        )
        recv = jax.lax.ppermute(msg, hfe.axis, hfe.rev_pairs(r))
        ru = recv[: dim * msg_n].reshape(dim, msg_n)
        rp = recv[dim * msg_n :]
        u = u.at[:, send_nodes[r, 0]].add(ru)
        p = p.at[send_verts[r, 0]].add(rp)
    u = u[:, :n_ln].at[:, hfe.n_on_max :].set(0.0)
    p = p[:n_lp].at[hfe.n_op_max :].set(0.0)
    return jnp.concatenate([u.reshape(-1), p])


def import_halo_p(hfe: HaloFE, p, send_verts):
    """Pressure-only ghost import: fill halo vertex slots from their owners.

    The pressure-space analog of :func:`import_halo` (a dim+1-times smaller
    message), used by the distributed Schur K_p apply
    (parallel/halo_schur.py).
    """
    p = jnp.concatenate([p, jnp.zeros((1,), p.dtype)])
    for r in range(hfe.n_rounds):
        recv = jax.lax.ppermute(p[send_verts[r, 0]], hfe.axis, hfe.pairs(r))
        p = p.at[send_verts[r, 1]].set(recv)
    return p[: hfe.n_lp]


def export_halo_p(hfe: HaloFE, yp, send_verts):
    """Pressure-only compress(add): halo vertex partials to their owners.

    Used by the divergence-only preconditioner step (a dim-times-smaller
    message than the full export).
    """
    p = jnp.concatenate([yp, jnp.zeros((1,), yp.dtype)])
    for r in range(hfe.n_rounds):
        recv = jax.lax.ppermute(p[send_verts[r, 1]], hfe.axis, hfe.rev_pairs(r))
        p = p.at[send_verts[r, 0]].add(recv)
    return p[: hfe.n_lp].at[hfe.n_op_max :].set(0.0)


def local_fields(hfe: HaloFE, x):
    """Local flat vector (halos imported) -> (u (n_ln, dim), p (n_lp,))."""
    u = x[: hfe.dim * hfe.n_ln].reshape(hfe.dim, hfe.n_ln).T
    return u, x[hfe.dim * hfe.n_ln :]


def gather_vel(hfe: HaloFE, x2):
    """(P, n_ld) owned blocks -> replicated (n_vnodes_glob, dim) velocity.

    The velocity-space analog of the Schur solve's pressure gather in
    parallel/halo_solver.py — used by the replicated P1-coarse velocity
    correction (coarse solves are replicated in distributed AMG stacks too).
    """
    dim, nvg = hfe.dim, hfe.n_vnodes_glob
    u_part = x2[:, : dim * hfe.n_ln].reshape(hfe.n_shards, dim, hfe.n_ln)
    u_own = u_part[:, :, : hfe.n_on_max]
    u_glob = (
        jnp.zeros((dim, nvg + 1), x2.dtype)
        .at[:, hfe.owned_nodes.reshape(-1)]
        .set(jnp.moveaxis(u_own, 1, 0).reshape(dim, -1))[:, :-1]
    )
    return u_glob.T


def owned_vel(hfe: HaloFE, u_glob):
    """Replicated (n_vnodes_glob, dim) velocity -> (P, dim*n_ln) owned rows."""
    dim = hfe.dim
    u = jnp.concatenate([u_glob.T, jnp.zeros((dim, 1), u_glob.dtype)], axis=1)
    u_own = jnp.moveaxis(u[:, hfe.owned_nodes], 1, 0)  # (P, dim, n_on_max)
    u_loc = jnp.concatenate(
        [u_own, jnp.zeros((hfe.n_shards, dim, hfe.n_hn_max), u_own.dtype)], axis=2
    )
    return u_loc.reshape(hfe.n_shards, dim * hfe.n_ln)
