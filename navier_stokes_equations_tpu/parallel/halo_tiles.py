"""Tile operator on the halo layout: the assembled fast path, distributed.

``ops/tile_operator.py`` reduces the per-step operator ONCE to per-tile
dense node-block matrices so every Krylov application is one slot gather +
batched MXU matvecs — the operator behind the single-chip headline.  Until
now it was single-chip-only (PARITY.md #8): the halo layout evaluated
operators through its shard_mapped quadrature kernels.  This module closes
that asymmetry: each strip gets its OWN tile decomposition in the strip's
LOCAL node numbering (parallel/halo_fe.py), so inside ``shard_map`` the
per-strip slice is an ordinary ``TileArrays`` and the existing tile-block
builders (``build_tile_blocks``, ``build_tile_blocks_oseen``,
``build_tile_statics``) run verbatim on the strip — ghost import/export
wrapped around the tile matvec exactly as around the quadrature kernels.

Because every real element lives in exactly one strip, the per-strip tile
reductions partition the global element sum; after the halo export
(compress(add)) the distributed tile matvec equals the single-chip one in
exact arithmetic.  Equivalence is gated on an 8-device CPU mesh in
tests/test_halo_tiles.py.

Differences from the single-chip decomposition (ops/tile_operator.py):

  * slots are grouped per tile as [vertex | edge] only — the four-way
    interface/interior split exists solely for the tile-RESIDENT Krylov
    representation, which stays single-chip (its inter-tile exchange is a
    same-chip gather; across chips the halo layout's node-level exchange
    already carries the O(interface) traffic);
  * the local node space and the local pressure space are DIFFERENT
    numberings on the halo layout (owned-then-halo each), so the pressure
    slots carry an explicit ``tile_verts`` table instead of riding the
    node ids;
  * the accumulation maps target the full local space (owned + halo
    slots) with shard-uniform bucket widths (halo_fe._stacked_bucketed_maps),
    and the halo export sums the halo partials into their owners.

Reference analog: the per-process slice of the distributed Trilinos
BlockSparseMatrix assembled once per step and applied inside GMRES
(reference: src/classes/NavierStokes.cpp:255-273, 833-868) — here the
"local sparse matrix" is the strip's tile decomposition, dense and
MXU-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tile_operator import TileArrays, _morton, _rcb_order
from . import halo_fe as hf


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloTiles:
    """Stacked per-strip tile decompositions (leading axis = n_shards).

    ``tiles``: a ``TileArrays`` whose LEAVES are stacked (P, ...) and whose
    static metadata describes the LOCAL tile sizes — ``tree.map(lambda a:
    a[0], tiles)`` inside a shard_map body yields a plain per-strip
    ``TileArrays`` (same trick as ``HaloFE.fe_stack``).  Its ``tile_nodes``
    hold LOCAL node ids (sentinel n_ln); the tile-resident fields (if_*,
    own_slot, wmask, acc_map/p_acc) are inert placeholders.
    """

    tiles: TileArrays
    tile_verts: Any  # (P, nt, un_p) local vertex ids; sentinel n_lp
    # Stacked bucketed transpose maps (shard-uniform widths): positions in
    # the flattened (nt*un,) slot space per local node / (nt*un_p,) vertex
    # slot space per local pressure vertex.  Sentinel = flat size (an
    # appended zero row).
    acc_node: Any  # tuple of (P, range_len, w) covering [0, n_ln)
    acc_vert: Any  # tuple of (P, range_len, w) covering [0, n_lp)

    n_shards: int = dataclasses.field(metadata=dict(static=True))


def _loc(tree):
    """Per-strip slice of a stacked pytree (inside a shard_map body)."""
    return jax.tree.map(lambda a: a[0], tree)


def build_halo_tiles(mesh, hfe: hf.HaloFE, tile_e: int = 32,
                     cluster: str = "auto") -> HaloTiles:
    """Host-side per-strip tile decomposition from a built ``HaloFE``.

    Reads the strip-local connectivity straight from ``hfe.fe_stack`` (the
    local numbering is never re-derived, so it cannot diverge from the
    exchange tables).  ``cluster`` mirrors the single-chip semantics:
    "rcb" / "morton" element ordering per strip, or "auto" (evaluate both
    and keep the ordering with the smaller shard-uniform padded slot
    width).
    """
    P = hfe.n_shards
    e2l = np.asarray(hfe.fe_stack.elems_p2)  # (P, n_el_loc, n2) local nodes
    e1l = np.asarray(hfe.fe_stack.elems_p1)  # (P, n_el_loc, n1) local verts
    gids = np.asarray(hfe.elem_gids)  # (P, n_el_loc) global ids, -1 pad
    n_el_loc, n2 = e2l.shape[1:]
    n1 = e1l.shape[2]
    n_ln, n_lp = hfe.n_ln, hfe.n_lp
    nt = -(-n_el_loc // tile_e)
    n_slots = nt * tile_e

    # Local vertex id of each local node (-1 at edge midpoints and at local
    # slots no element touches).  Consistent by the element invariant that
    # the first n1 P2 nodes of an element ARE its P1 vertices.
    vert_of = np.full((P, n_ln + 1), -1, np.int64)
    for s in range(P):
        vert_of[s][e2l[s][:, :n1].reshape(-1)] = e1l[s].reshape(-1)

    verts_glob = np.asarray(mesh.vertices)
    e1g = np.asarray(mesh.elems_p1)
    # Real elements carry geometry; strip pads (gid -1) and globally padded
    # elements (zero jacobians) are inert — they ride trailing tiles.
    real = (gids >= 0) & (gids < mesh.n_el_real)

    def orders_for(kind):
        """Per-strip element-slot orderings: clustered real slots first,
        inert slots after."""
        orders = []
        for s in range(P):
            rs = np.flatnonzero(real[s])
            cent = verts_glob[e1g[gids[s][rs]]].mean(axis=1)
            o = _rcb_order(cent, tile_e) if kind == "rcb" else np.argsort(
                _morton(cent), kind="stable"
            )
            orders.append(np.concatenate([rs[o], np.flatnonzero(~real[s])]))
        return orders

    def evaluate(orders):
        """Tiled node sets + shard-uniform [vertex | edge] group widths."""
        per_strip = []
        w_v = w_e = 0
        for s in range(P):
            eo = np.concatenate(
                [orders[s], np.full(n_slots - n_el_loc, n_el_loc)]
            ).astype(np.int32)
            nodes_pad = np.concatenate(
                [e2l[s], np.full((1, n2), n_ln, e2l.dtype)]
            )
            tiled = nodes_pad[eo.reshape(nt, tile_e)]  # (nt, te, n2)
            groups = []
            for t in range(nt):
                u = np.unique(tiled[t])
                u = u[u < n_ln]
                isv = vert_of[s][u] >= 0
                groups.append((u[isv], u[~isv]))
                w_v = max(w_v, len(groups[-1][0]))
                w_e = max(w_e, len(groups[-1][1]))
            per_strip.append((eo, tiled, groups))
        r8 = lambda x: -(-max(x, 1) // 8) * 8
        return per_strip, r8(w_v), r8(w_e)

    candidates = {}
    if cluster in ("rcb", "auto"):
        candidates["rcb"] = evaluate(orders_for("rcb"))
    if cluster in ("morton", "auto"):
        candidates["morton"] = evaluate(orders_for("morton"))
    if not candidates:
        raise ValueError(f"unknown tile cluster {cluster!r}")
    best = min(candidates, key=lambda k: candidates[k][1] + candidates[k][2])
    per_strip, un_p, w_e = candidates[best]
    un = un_p + w_e

    dt = np.asarray(hfe.fe_stack.jxw).dtype
    elem_order = np.empty((P, n_slots), np.int32)
    tile_nodes = np.full((P, nt, un), n_ln, np.int32)
    tile_verts = np.full((P, nt, un_p), n_lp, np.int32)
    E = np.zeros((P, nt, tile_e * n2, un), dt)
    E_p = np.zeros((P, nt, tile_e * n1, un_p), dt)
    for s, (eo, tiled, groups) in enumerate(per_strip):
        elem_order[s] = eo
        loc = np.zeros((nt, tile_e, n2), np.int32)
        for t, (vs, es) in enumerate(groups):
            if len(vs) + len(es) == 0:  # all-sentinel pad tile: E zeroed below
                continue
            tile_nodes[s, t, : len(vs)] = vs
            tile_nodes[s, t, un_p : un_p + len(es)] = es
            tile_verts[s, t, : len(vs)] = vert_of[s][vs]
            # u is SORTED (vs/es partition np.unique's output, which may
            # interleave: halo-vertex local ids exceed owned-edge ids);
            # searchsorted must run against it, not the concatenated groups.
            u = np.sort(np.concatenate([vs, es]))
            slot_of = np.empty(len(u), np.int32)
            slot_of[np.searchsorted(u, vs)] = np.arange(len(vs))
            slot_of[np.searchsorted(u, es)] = un_p + np.arange(len(es))
            # Sentinel-element rows clamp onto the last node and are zeroed
            # below (their tiled[t] row is all n_ln).
            loc[t] = slot_of[np.searchsorted(u, np.minimum(tiled[t], u[-1]))]
        Es = (loc.reshape(nt, tile_e * n2)[:, :, None] == np.arange(un)).astype(dt)
        Eps = (
            loc[:, :, :n1].reshape(nt, tile_e * n1)[:, :, None]
            == np.arange(un_p)
        ).astype(dt)
        sent = eo.reshape(nt, tile_e) == n_el_loc
        Es *= ~np.repeat(sent, n2, axis=1)[:, :, None]
        Eps *= ~np.repeat(sent, n1, axis=1)[:, :, None]
        E[s], E_p[s] = Es, Eps

    # Accumulation maps over the FULL local spaces (owned + halo regions as
    # bucket bounds); the trailing [sentinel] range is dropped.
    acc_node = hf._stacked_bucketed_maps(
        [tile_nodes[s].astype(np.int64) for s in range(P)],
        n_ln + 1,
        [hfe.n_on_max, n_ln],
    )[:-1]
    acc_vert = hf._stacked_bucketed_maps(
        [tile_verts[s].astype(np.int64) for s in range(P)],
        n_lp + 1,
        [hfe.n_op_max, n_lp],
    )[:-1]

    zi = jnp.zeros((P, 1), jnp.int32)
    tiles = TileArrays(
        elem_order=jnp.asarray(elem_order),
        tile_nodes=jnp.asarray(tile_nodes),
        E=jnp.asarray(E),
        E_p=jnp.asarray(E_p),
        # Tile-resident machinery is single-chip-only: inert placeholders.
        acc_map=(),
        if_acc=(),
        if_back=zi,
        p_acc=(),
        own_slot=zi,
        wmask=jnp.zeros((P, 1, 1, 1), dt),
        n_tiles=nt,
        tile_e=tile_e,
        un=un,
        un_p=un_p,
        w_vi=0,
        w_ei=0,
        n_ifn=0,
    )
    return HaloTiles(
        tiles=tiles,
        tile_verts=jnp.asarray(tile_verts),
        acc_node=tuple(jnp.asarray(g) for g in acc_node),
        acc_vert=tuple(jnp.asarray(g) for g in acc_vert),
        n_shards=P,
    )


def shard_halo_tiles(ht: HaloTiles, device_mesh) -> HaloTiles:
    """Place every stacked leaf with its leading axis over the device mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = NamedSharding(device_mesh, P("shard"))
    return jax.tree.map(lambda a: jax.device_put(a, spec), ht)


def build_halo_tile_statics(hfe: hf.HaloFE, ht: HaloTiles, device_mesh) -> HaloTiles:
    """One-time shard_mapped build of per-strip ``TileStatics`` (the fast
    non-SUPG Oseen build: static S1/S2/G/H + quadrature phi tables)."""
    from jax.sharding import PartitionSpec as P

    from ..ops import tile_operator

    ax = hfe.axis

    def body(fe_stack, tiles_stack):
        st = tile_operator.build_tile_statics(_loc(fe_stack), _loc(tiles_stack))
        return jax.tree.map(lambda a: a[None], st)

    mapped = jax.shard_map(
        body, mesh=device_mesh, in_specs=(P(ax), P(ax)), out_specs=P(ax)
    )
    statics = jax.jit(mapped)(hfe.fe_stack, ht.tiles)
    return dataclasses.replace(
        ht, tiles=dataclasses.replace(ht.tiles, statics=statics)
    )


# ---------------------------------------------------------------------------
# Per-strip apply bodies (call INSIDE shard_map; ``ht_loc``/``blk`` are this
# strip's slices via _loc, ``x`` is the local flat vector with halos already
# imported).  Outputs carry halo PARTIALS — follow with hf.export_halo(_p).
# ---------------------------------------------------------------------------


def _accumulate(maps_loc, rows_flat):
    """(n_entries, k) flat slot rows -> concatenated bucketed sums."""
    z = jnp.concatenate(
        [rows_flat, jnp.zeros((1, rows_flat.shape[-1]), rows_flat.dtype)]
    )
    return jnp.concatenate([z[g].sum(axis=1) for g in maps_loc])


def _gather_tiles(hfe: hf.HaloFE, ht_loc: HaloTiles, x, vel_only=False):
    """Local flat x -> ((nt, un, dim) velocity slots, (nt, un_p) pressure)."""
    u, p = hf.local_fields(hfe, x)  # (n_ln, dim), (n_lp,)
    tiles = ht_loc.tiles
    up = jnp.concatenate([u, jnp.zeros((1, hfe.dim), u.dtype)])
    u_t = up[tiles.tile_nodes]  # (nt, un, dim) — sentinel reads the zero row
    if vel_only:
        return u_t, None
    pp = jnp.concatenate([p, jnp.zeros((1,), p.dtype)])
    return u_t, pp[ht_loc.tile_verts]  # (nt, un_p)


def _vel_rows(blk, u_t):
    if blk.V is None:
        return jnp.einsum("tuv,tvd->tud", blk.S, u_t)
    return jnp.einsum("tijuv,tvj->tui", blk.V, u_t)


def _pack_local(hfe: hf.HaloFE, ht_loc: HaloTiles, y_u, y_p):
    """((nt, un, dim), (nt, un_p) or None) slot rows -> local flat vector."""
    yu = _accumulate(ht_loc.acc_node, y_u.reshape(-1, hfe.dim))  # (n_ln, dim)
    if y_p is None:
        yp = jnp.zeros((hfe.n_lp,), y_u.dtype)
    else:
        yp = _accumulate(ht_loc.acc_vert, y_p.reshape(-1, 1))[:, 0]  # (n_lp,)
    return jnp.concatenate([yu.T.reshape(-1), yp])


def tile_apply_local(hfe: hf.HaloFE, ht_loc: HaloTiles, blk, x):
    """y = A x on the strip's tile blocks (full saddle-point operator)."""
    u_t, p_t = _gather_tiles(hfe, ht_loc, x)
    y_u = _vel_rows(blk, u_t) + jnp.einsum("tdvc,tc->tvd", blk.G, p_t)
    y_p = jnp.einsum("tdcv,tvd->tc", blk.H, u_t)
    return _pack_local(hfe, ht_loc, y_u, y_p)


def tile_velocity_local(hfe: hf.HaloFE, ht_loc: HaloTiles, blk, x):
    """Velocity-block rows only (pressure rows of the result are zero)."""
    u_t, _ = _gather_tiles(hfe, ht_loc, x, vel_only=True)
    return _pack_local(hfe, ht_loc, _vel_rows(blk, u_t), None)


def tile_divergence_local(hfe: hf.HaloFE, ht_loc: HaloTiles, blk, x):
    """Pressure rows B u as a local (n_lp,) vector (halo partials)."""
    u_t, _ = _gather_tiles(hfe, ht_loc, x, vel_only=True)
    y_p = jnp.einsum("tdcv,tvd->tc", blk.H, u_t)
    return _accumulate(ht_loc.acc_vert, y_p.reshape(-1, 1))[:, 0]
