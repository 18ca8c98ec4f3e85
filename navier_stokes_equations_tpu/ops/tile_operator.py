"""Tile-assembled operator: per-tile dense node-block matrices for the
Krylov hot path.

The quadrature-path operator (ops/matfree.py) re-gathers the trial vector
and re-derives the bilinear form on every application.  Inside FGMRES the
SAME Oseen/Jacobian operator is applied many times per step (Krylov
vectors + the preconditioner's post-smooth and divergence applications),
so assembling it ONCE per step amortizes that work away:

  * elements are ordered by Morton code of their centroid and grouped
    into tiles of ``tile_e`` elements; each tile touches a bounded set of
    nodes (``un`` slots after padding, vertex slots leading);
  * once per step the element blocks (ops/assembly.py ``oseen_blocks`` /
    ``newton_blocks``) are reduced to per-tile dense node-block matrices
    by EXACT f32 matmuls against static one-hot slot matrices
    (S = Eᵀ·blockdiag(A_e)·E — contraction length te*n2 keeps the MXU
    busy; the one-hot entries are 0/1 so every product is exact and only
    the final f32 accumulation rounds);
  * every operator application is then ONE node-level slot gather (the
    velocity components and pressure ride one slot row of width dim+1),
    batched (un x un) MXU tile matvecs that read the blocks once from
    HBM, and ONE bucketed accumulation of (un, dim+1) row blocks.

The block structure mirrors the saddle-point physics instead of storing
the dense ((dim+1)*un)^2 matrix (~4x less HBM traffic per application):

  S (nt, un, un)                component-shared velocity block (the Oseen
                                velocity operator is component-decoupled
                                without SUPG/grad-div/Newton coupling)
  V (nt, dim, dim, un, un)      component-coupled velocity block (Newton
                                convection coupling, SUPG, grad-div)
  G (nt, dim, un, un_p)         pressure gradient:  y_u[:, i] += G_i @ p
  H (nt, dim, un_p, un)         divergence rows:    y_p += sum_i H_i @ u_i

This is the TPU-native analog of assembling the reference's distributed
Trilinos BlockSparseMatrix once per step and running SpMV inside GMRES
(reference: src/classes/NavierStokes.cpp:255-273 sparsity + matrix
reinit, 833-868 GMRES on the assembled matrix); the "sparsity pattern"
here is the tile decomposition, whose blocks are dense MXU-friendly
(un = 128 at tile_e = 32 on 2D meshes).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .fe_arrays import FEArrays, _bucketed_transpose_map


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileArrays:
    """Static tile decomposition (host-built once per mesh).

    Shapes: NT tiles of TE elements; un node slots per tile (padded to
    the max over tiles, rounded to a lane-friendly multiple); un_p
    leading vertex slots carry the pressure dofs (the taylor_hood
    vertices-lead numbering makes np.unique return vertex nodes first).
    """

    elem_order: Any  # (NT*TE,) int32 element ids in tile order; pad = n_el
    tile_nodes: Any  # (NT, un) int32 global node id per slot; pad = n_vnodes
    E: Any  # (NT, TE*n2, un) one-hot slot matrix of each element node
    E_p: Any  # (NT, TE*n1, un_p) one-hot vertex-slot matrix
    acc_map: Any  # tuple of bucketed maps: (NT*un,) slots -> [0, n_vnodes)
    # Tile-RESIDENT Krylov support.  Slots are grouped per tile as
    # [vertex-interface | vertex-interior | edge-interface | edge-interior]
    # (group widths w_vi / un_p-w_vi / w_ei / rest, each padded mod 8), so
    # the pressure slots are the un_p prefix and the INTERFACE slots (nodes
    # shared by >=2 tiles) form two contiguous slabs: [0, w_vi) and
    # [un_p, un_p + w_ei).  After a tile matvec, interior slots already
    # hold the assembled value; only the two interface slabs exchange.
    if_acc: Any  # bucketed maps: (NT*w_if,) slab slots -> [0, n_ifn)
    if_back: Any  # (NT, w_if) int32 -> [0, n_ifn]; pad = n_ifn
    p_acc: Any  # bucketed maps: (NT*un_p,) vertex slots -> [0, n_p)
    own_slot: Any  # (n_vnodes,) int32 owner slot in the flat (NT*un) space
    wmask: Any  # (NT, un, dim+1) 0/1 owner weights for inner products
    n_tiles: int = dataclasses.field(metadata=dict(static=True))
    tile_e: int = dataclasses.field(metadata=dict(static=True))
    un: int = dataclasses.field(metadata=dict(static=True))
    un_p: int = dataclasses.field(metadata=dict(static=True))
    w_vi: int = dataclasses.field(metadata=dict(static=True))
    w_ei: int = dataclasses.field(metadata=dict(static=True))
    n_ifn: int = dataclasses.field(metadata=dict(static=True))
    # Device-built TileStatics for the fast Oseen build (attached by the
    # solver via dataclasses.replace after construction); None until then.
    statics: Any = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileBlocks:
    """Per-step tile matrices (device, rebuilt each assembly)."""

    S: Any  # (NT, un, un) or None (coupled case)
    V: Any  # (NT, dim, dim, un, un) or None (uncoupled case)
    G: Any  # (NT, dim, un, un_p)
    H: Any  # (NT, dim, un_p, un)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileStatics:
    """Static (per-mesh) tile matrices and quadrature tables for the fast
    Oseen build.  The non-SUPG Oseen operator is

        S(dt, theta, u*) = S1/dt + theta*nu*S2 + theta*Conv(u*)

    with S1 (mass) / S2 (stiffness) / G / H static — only the convection
    term needs per-step work: ONE batched MXU contraction of the static
    quadrature tables against u* (reference weak form: cpp:747-765)."""

    S1: Any  # (NT, un, un) velocity mass tile matrices
    S2: Any  # (NT, un, un) velocity stiffness tile matrices
    G: Any  # (NT, dim, un, un_p) pressure gradient (static without SUPG)
    H: Any  # (NT, dim, un_p, un) divergence rows
    phi_val: Any  # (NT, TE*nq, un) P2 values of each slot basis function
    phi_g: Any  # (NT, dim, TE*nq, un) physical gradients of slot basis
    w: Any  # (NT, TE*nq) quadrature weights x |J|


def _morton(cent: np.ndarray) -> np.ndarray:
    """Morton (Z-order) code of element centroids, 2D or 3D."""
    dim = cent.shape[1]
    bits = 16 if dim == 2 else 10
    q = np.clip(
        ((cent - cent.min(0)) / (np.ptp(cent, axis=0) + 1e-30) * (2**bits - 1)),
        0,
        2**bits - 1,
    ).astype(np.uint64)

    def spread(v, gap):
        out = np.zeros_like(v)
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * (gap + 1))
        return out

    code = np.zeros(len(cent), np.uint64)
    for d in range(dim):
        code |= spread(q[:, d], dim - 1) << d
    return code


def _rcb_order(cent: np.ndarray, tile_e: int) -> np.ndarray:
    """Element ordering whose consecutive ``tile_e`` blocks are compact,
    uniform spatial boxes (recursive coordinate bisection with counts
    kept multiples of ``tile_e``).

    Why: the tile slot width ``un`` is a MAX over tiles, and every Krylov
    application costs ~7 ns per padded slot on TPU regardless of the
    index pattern (gather latency, not bandwidth — see CLAUDE.md).  Raw
    Morton order fragments tiles across curve jumps: on mesh-2D-100 at
    tile_e=16 it yields mean 59 / max 74 distinct nodes per tile and
    un=104 after group-max stacking.  RCB leaves are exact-tile_e
    compact boxes with TIGHT node-count spread (mean 46 / p99 49 /
    max 53, un=80 on the same mesh: -23% padded slots).  A greedy
    max-node-sharing growth was also measured: better mean (47) but
    fragmented leftovers set a WORSE max (79) — uniformity is what the
    static shape pays for, so RCB wins.

    O(n_el log n_el) numpy argpartitions — microseconds-to-ms one-time
    host cost at solver construction.
    """
    n = len(cent)
    out = np.empty(n, np.int64)
    pos = [0]

    def rec(idx):
        if len(idx) <= tile_e:
            out[pos[0]:pos[0] + len(idx)] = idx
            pos[0] += len(idx)
            return
        c = cent[idx]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        nt = len(idx) // tile_e
        # Left child takes ceil(nt/2) whole tiles; the (< tile_e)
        # remainder rides with the right child until it is a leaf.
        nl = min((nt + 1) // 2 * tile_e, len(idx))
        part = np.argpartition(c[:, ax], nl - 1)
        rec(idx[part[:nl]])
        rec(idx[part[nl:]])

    rec(np.arange(n))
    assert pos[0] == n
    return out


def build_tile_arrays(mesh, fe: FEArrays, tile_e: int = 32,
                      cluster: str = "auto") -> TileArrays:
    """Host-side tile decomposition of the element set.

    Uses the HOST mesh arrays throughout (pulling fe device arrays
    through the axon tunnel costs minutes at this size).

    ``cluster``: "auto" (evaluate both orderings below and keep the one
    with the smaller padded slot width ``un`` — the only quantity the
    static shapes see), "rcb" (recursive coordinate bisection into
    exact-tile_e compact boxes — tight per-tile node-count spread) or
    "morton" (raw curve order, the round-3 behavior).
    """
    n_el, n2, n1 = fe.n_el, fe.n2, fe.n1
    nv, nvert = fe.n_vnodes, mesh.n_vertices
    e2 = np.asarray(mesh.elems_p2)
    if not np.array_equal(e2[:, :n1], np.asarray(mesh.elems_p1)):
        raise NotImplementedError(
            "tile operator requires the vertices-lead P2 numbering "
            "(taylor_hood synthesis invariant)"
        )
    n_real = mesh.n_el_real
    cent = mesh.vertices[np.asarray(mesh.elems_p1)[:n_real]].mean(axis=1)
    nt = (n_el + tile_e - 1) // tile_e
    pad = nt * tile_e - n_el
    nodes_pad = np.concatenate([e2, np.zeros((1, n2), e2.dtype)])  # sentinel row

    def r8(x):
        return -(-max(x) // 8) * 8 if x else 8

    def evaluate(order):
        """(tiled_nodes, uniq, interface, group widths) for one ordering.

        Mesh-level padded elements (zero jacobians) go in trailing tiles.
        """
        order = np.concatenate([order, np.arange(n_real, n_el)])
        elem_order = np.concatenate([order, np.full(pad, n_el)]).astype(np.int32)
        tiled_nodes = nodes_pad[elem_order.reshape(nt, tile_e)]  # (nt, TE, n2)
        # Vertex node ids < nvert < edge-midpoint ids (taylor_hood).
        uniq = [np.unique(t) for t in tiled_nodes]
        # Interface nodes appear in >= 2 tiles.
        cnt = np.zeros(nv + 1, np.int64)
        for u in uniq:
            cnt[u] += 1
        interface = cnt >= 2
        groups = []  # per tile: (vi, vn, ei, en) node-id arrays
        for u in uniq:
            isv = u < nvert
            isi = interface[u]
            groups.append(
                (u[isv & isi], u[isv & ~isi], u[~isv & isi], u[~isv & ~isi])
            )
        widths = tuple(
            r8([len(g[gi]) for g in groups]) for gi in range(4)
        )
        return elem_order, tiled_nodes, uniq, interface, groups, widths

    candidates = {}
    if cluster in ("rcb", "auto"):
        candidates["rcb"] = _rcb_order(cent, tile_e)
    if cluster in ("morton", "auto"):
        candidates["morton"] = np.argsort(_morton(cent), kind="stable")
    if not candidates:
        raise ValueError(f"unknown tile cluster {cluster!r}")
    # "auto": the padded slot width un is the ONLY thing the static
    # shapes (and the ~7 ns/slot gather cost) see — pick the ordering
    # that minimizes it.  RCB wins on quasi-uniform meshes (80 vs 104 on
    # mesh-2D-100/te=16); Morton wins on strongly graded ones (104 vs
    # 120 on the 855k-dof rung, whose count-median boxes straddle the
    # grading interface).
    evals = {k: evaluate(v) for k, v in candidates.items()}
    best = min(evals, key=lambda k: sum(evals[k][5]))
    elem_order, tiled_nodes, uniq, interface, groups, widths = evals[best]
    w_vi, w_vn, w_ei, w_en = widths
    un_p = w_vi + w_vn
    un = un_p + w_ei + w_en
    starts = (0, w_vi, un_p, un_p + w_ei)

    tile_nodes = np.full((nt, un), nv, np.int32)
    loc = np.zeros((nt, tile_e, n2), np.int32)
    for t, (u, g) in enumerate(zip(uniq, groups)):
        slot_of = np.empty(len(u), np.int32)
        for gi, part in enumerate(g):
            s = starts[gi]
            tile_nodes[t, s : s + len(part)] = part
            slot_of[np.searchsorted(u, part)] = s + np.arange(len(part))
        loc[t] = slot_of[np.searchsorted(u, tiled_nodes[t])]
    # Per-element slot maps are injective (distinct nodes -> distinct
    # slots); sentinel elements (node row 0) land on slot 0 with zero
    # matrix blocks, which is harmless.

    # --- interface exchange maps (tile-resident Krylov) -----------------
    # Flat slab space: per tile, rows [0, w_vi) then [un_p, un_p + w_ei).
    w_if = w_vi + w_ei
    slab_nodes = np.concatenate(
        [tile_nodes[:, :w_vi], tile_nodes[:, un_p : un_p + w_ei]], axis=1
    )  # (nt, w_if); pad slots carry nv
    if_ids = np.flatnonzero(interface[:nv])  # global node ids, vertices first
    n_ifn = len(if_ids)
    n_if_vert = int((if_ids < nvert).sum())
    # Dense renumber: global node id -> interface index (vertices lead).
    if_index = np.full(nv + 1, n_ifn, np.int64)
    if_index[if_ids] = np.arange(n_ifn)
    slab_targets = if_index[slab_nodes]  # (nt, w_if) -> [0, n_ifn]; pad = n_ifn
    if_parts = _bucketed_transpose_map(
        slab_targets, n_ifn + 1, [n_if_vert, n_ifn]
    )
    rows_if = 0
    if_acc = []
    for p in if_parts:
        if rows_if >= n_ifn:
            break
        if_acc.append(p)
        rows_if += p.shape[0]
    assert rows_if == n_ifn

    # Pressure-slab accumulate: (nt*un_p) vertex slots -> [0, n_p).
    p_targets = np.where(
        tile_nodes[:, :un_p] < nvert, tile_nodes[:, :un_p], nvert
    ).astype(np.int64)
    p_parts = _bucketed_transpose_map(p_targets, nvert + 1, [nvert])
    rows_p = 0
    p_acc = []
    for p in p_parts:
        if rows_p >= nvert:
            break
        p_acc.append(p)
        rows_p += p.shape[0]
    assert rows_p == nvert

    # Owner slot (first occurrence) of every node in the flat (nt*un) space.
    flat_nodes = tile_nodes.reshape(-1)
    order_seen = np.argsort(flat_nodes, kind="stable")
    sorted_nodes = flat_nodes[order_seen]
    starts_u = np.searchsorted(sorted_nodes, np.arange(nv))
    own_slot = order_seen[starts_u].astype(np.int32)

    # One-hot slot matrices (static; the build contracts against them).
    dt = np.float64 if fe.jxw.dtype == jnp.float64 else np.float32

    # Owner weights: 1 at the owner slot per live (node, component).
    dim = fe.dim
    wmask = np.zeros((nt * un, dim + 1), dt)
    wmask[own_slot, :dim] = 1.0
    wmask[own_slot[:nvert], dim] = 1.0  # pressure lives on vertex nodes
    wmask = wmask.reshape(nt, un, dim + 1)
    E = (loc.reshape(nt, tile_e * n2)[:, :, None] == np.arange(un)).astype(dt)
    loc_p = loc[:, :, :n1]  # vertex slots of each element (< un_p)
    E_p = (loc_p.reshape(nt, tile_e * n1)[:, :, None] == np.arange(un_p)).astype(dt)
    # Sentinel elements would contribute spurious 1s at slot 0 — zero
    # their rows outright (their values are zero anyway, but keeping E
    # exact makes the build independent of value-padding conventions).
    sent = (elem_order.reshape(nt, tile_e) == n_el)
    E *= ~np.repeat(sent, n2, axis=1)[:, :, None]
    E_p *= ~np.repeat(sent, n1, axis=1)[:, :, None]

    # Accumulation transpose map: (nt*un) tile slots -> global nodes.
    # Pad slots carry target nv; covering [0, nv + 1) and dropping the
    # trailing single-row range discards them.
    parts = _bucketed_transpose_map(
        tile_nodes.astype(np.int64), nv + 1, [nvert, nv]
    )
    rows = 0
    kept = []
    for p in parts:
        if rows >= nv:
            break
        kept.append(p)
        rows += p.shape[0]
    assert rows == nv, "tile accumulation map must cover exactly [0, n_vnodes)"

    return TileArrays(
        elem_order=jnp.asarray(elem_order),
        tile_nodes=jnp.asarray(tile_nodes),
        E=jnp.asarray(E),
        E_p=jnp.asarray(E_p),
        acc_map=tuple(jnp.asarray(g) for g in kept),
        if_acc=tuple(jnp.asarray(g) for g in if_acc),
        if_back=jnp.asarray(slab_targets.astype(np.int32)),
        p_acc=tuple(jnp.asarray(g) for g in p_acc),
        own_slot=jnp.asarray(own_slot),
        wmask=jnp.asarray(wmask),
        n_tiles=nt,
        tile_e=tile_e,
        un=un,
        un_p=un_p,
        w_vi=w_vi,
        w_ei=w_ei,
        n_ifn=n_ifn,
    )


def _gather_elem(tiles: TileArrays, nchunk: int, A):
    """(n_el, ...) element array -> (nchunk, Bc, TE, ...) in tile order,
    sentinel elements zero."""
    z = jnp.concatenate([A, jnp.zeros((1,) + A.shape[1:], A.dtype)])
    nt, te = tiles.n_tiles, tiles.tile_e
    Bc = -(-nt // nchunk)
    pad = nchunk * Bc - nt
    eo = jnp.concatenate(
        [tiles.elem_order, jnp.full((pad * te,), A.shape[0], jnp.int32)]
    )
    return z[eo].reshape((nchunk, Bc, te) + A.shape[1:])


def _pad_tiles(x, nchunk):
    """(nt, ...) -> (nchunk, Bc, ...) with zero padding."""
    nt = x.shape[0]
    Bc = -(-nt // nchunk)
    pad = nchunk * Bc - nt
    xp = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return xp.reshape((nchunk, Bc) + x.shape[1:])


def _blockdiag(A):
    """(B, te, m, n) stacked element blocks -> (B, te*m, te*n)
    block-diagonal."""
    B, te, m, n = A.shape
    eye = jnp.eye(te, dtype=A.dtype)
    bd = jnp.einsum("tkab,kl->tkalb", A, eye)
    return bd.reshape(B, te * m, te * n)


def build_tile_blocks(
    fe: FEArrays,
    tiles: TileArrays,
    diag_vv,  # (n_el, n2, n2)
    cross_vv,  # (n_el, n2, dim, n2, dim) or None
    A_vp,  # (n_el, n2, dim, n1)
    A_pv,  # (n_el, n1, n2, dim)
) -> TileBlocks:
    """Element blocks -> per-tile dense node-block matrices.

    Exact in f32 up to accumulation order: every contraction is an f32
    matmul where one operand is 0/1 (the padded one-hot slot matrices),
    so each product is exact and only the final sums round — unlike
    bf16-pass tricks, which measured ~3e-3 relative error on TPU.
    All matmuls have contraction length te*n2 (192 at tile_e=32 in 2D),
    so the MXU runs at real utilization.
    """
    dim, n2, n1 = fe.dim, fe.n2, fe.n1
    nt, te, un, un_p = tiles.n_tiles, tiles.tile_e, tiles.un, tiles.un_p
    K = te * n2
    # Chunk tiles so the blockdiag intermediate stays ~<=64 MB.
    nchunk = max(1, -(-nt // max(1, (64 << 20) // (K * K * 4))))
    Ec = _pad_tiles(tiles.E, nchunk)
    Epc = _pad_tiles(tiles.E_p, nchunk)

    Ao = _gather_elem(tiles, nchunk, diag_vv)
    Gvp = _gather_elem(tiles, nchunk, A_vp)
    Gpv = _gather_elem(tiles, nchunk, A_pv)
    Xo = None if cross_vv is None else _gather_elem(tiles, nchunk, cross_vv)

    def per_chunk(args):
        if cross_vv is None:
            E, Ep, A, vp, pv = args
        else:
            E, Ep, A, vp, pv, X = args
        EtA = jnp.einsum("tKu,tKL->tuL", E, _blockdiag(A))
        S = jnp.einsum("tuL,tLv->tuv", EtA, E)
        G = []
        H = []
        for i in range(dim):
            bd = _blockdiag(vp[..., i, :])  # (B, K, te*n1)
            G.append(jnp.einsum("tKu,tKC,tCc->tuc", E, bd, Ep))
            bdT = _blockdiag(pv[..., i])  # (B, te*n1, K)
            H.append(jnp.einsum("tCc,tCK,tKu->tcu", Ep, bdT, E))
        G = jnp.stack(G, axis=1)  # (B, dim, un, un_p)
        H = jnp.stack(H, axis=1)  # (B, dim, un_p, un)
        if cross_vv is None:
            return S, G, H
        eye = jnp.eye(dim, dtype=S.dtype)
        V = []
        for i in range(dim):
            row = []
            for j in range(dim):
                bd = _blockdiag(X[:, :, :, i, :, j])
                EtX = jnp.einsum("tKu,tKL->tuL", E, bd)
                row.append(jnp.einsum("tuL,tLv->tuv", EtX, E) + eye[i, j] * S)
            V.append(jnp.stack(row, axis=1))
        return jnp.stack(V, axis=1), G, H  # (B, dim, dim, un, un)

    args = (Ec, Epc, Ao, Gvp, Gpv) + (() if cross_vv is None else (Xo,))
    out = jax.lax.map(per_chunk, args)
    SV, G, H = (x.reshape((-1,) + x.shape[2:])[:nt] for x in out)
    if cross_vv is None:
        return TileBlocks(S=SV, V=None, G=G, H=H)
    return TileBlocks(S=None, V=SV, G=G, H=H)


def build_tile_statics(fe: FEArrays, tiles: TileArrays) -> TileStatics:
    """One-time device build of the static tile matrices + quadrature
    tables (jit this with (fe, tiles) as ARGUMENTS — closure capture of
    fe lowers the arrays host-side)."""
    nt, te = tiles.n_tiles, tiles.tile_e
    n2, n1, nq, dim = fe.n2, fe.n1, fe.nq, fe.dim
    g2 = fe.phys_grads_p2()
    mass = jnp.einsum("eq,qa,qb->eab", fe.jxw, fe.p2_val, fe.p2_val)
    stiff = jnp.einsum("eq,eqad,eqbd->eab", fe.jxw, g2, g2)
    bmat = -jnp.einsum("eq,qc,eqad->eadc", fe.jxw, fe.p1_val, g2)  # A_vp
    apv = jnp.transpose(bmat, (0, 3, 1, 2))
    b1 = build_tile_blocks(fe, tiles, mass, None, bmat, apv)
    zvp = jnp.zeros_like(bmat)
    b2 = build_tile_blocks(fe, tiles, stiff, None, zvp, jnp.zeros_like(apv))

    E4 = tiles.E.reshape(nt, te, n2, tiles.un)
    phi_val = jnp.einsum("qa,tkau->tkqu", fe.p2_val, E4).reshape(
        nt, te * nq, tiles.un
    )
    g2_t = _gather_elem(tiles, 1, g2)[0]  # (nt, te, nq, n2, dim)
    phi_g = jnp.einsum("tkqad,tkau->tdkqu", g2_t, E4).reshape(
        nt, dim, te * nq, tiles.un
    )
    w = _gather_elem(tiles, 1, fe.jxw)[0].reshape(nt, te * nq)
    return TileStatics(
        S1=b1.S, S2=b2.S, G=b1.G, H=b1.H, phi_val=phi_val, phi_g=phi_g, w=w
    )


def build_tile_blocks_oseen(
    fe: FEArrays, tiles: TileArrays, params, u_star
) -> TileBlocks:
    """Fast per-step Oseen tile build (non-SUPG): axpy of the static
    matrices plus one batched MXU contraction for the convection term.

    Evaluates the identical weak form as assembly.oseen_blocks (the
    phi tables carry exactly the element shape values; slots outside an
    element contribute exact zeros), reassociated over quadrature points
    instead of elements."""
    st: TileStatics = tiles.statics
    upz = jnp.concatenate([u_star, jnp.zeros((1, fe.dim), u_star.dtype)])
    u_t = upz[tiles.tile_nodes]  # (nt, un, dim)
    uq = jnp.einsum("tQu,tud->tQd", st.phi_val, u_t)  # u* at tile q-points
    phi_adv = jnp.einsum("tQd,tdQu->tQu", uq, st.phi_g)  # (u*.grad)phi
    conv = jnp.einsum("tQu,tQ,tQv->tuv", st.phi_val, st.w, phi_adv)
    S = (
        st.S1 / params.dt
        + (params.theta * params.nu) * st.S2
        + params.theta * conv
    )
    return TileBlocks(S=S, V=None, G=st.G, H=st.H)


def make_tile_operator(fe: FEArrays, tiles: TileArrays, blocks: TileBlocks):
    """Return apply(x) = A x from tile blocks, with ``.velocity_block``
    and ``.divergence`` attributes (the contract of
    matfree.make_system_operator).

    Everything is slot-major: the gather's natural (nt, un, dim+1) output
    feeds the batched matvecs and the accumulation directly — no
    transposes anywhere on the hot path.
    """
    dim, nv, n_p, n_u = fe.dim, fe.n_vnodes, fe.n_p, fe.n_udofs
    C = dim + 1
    nt, un, un_p = tiles.n_tiles, tiles.un, tiles.un_p
    S, V, G, H = blocks.S, blocks.V, blocks.G, blocks.H

    def gather_x(x, vel_only=False):
        u = x[:n_u].reshape(dim, nv).T
        if vel_only:
            p = jnp.zeros((nv,), x.dtype)
        else:
            p = jnp.pad(x[n_u:], (0, nv - n_p))
        up = jnp.concatenate([u, p[:, None]], axis=1)
        upz = jnp.concatenate([up, jnp.zeros((1, C), x.dtype)])
        return upz[tiles.tile_nodes]  # (nt, un, C) — ONE slot gather

    def vel_rows(u_t):
        if V is None:
            return jnp.einsum("tuv,tvd->tud", S, u_t)
        return jnp.einsum("tijuv,tvj->tui", V, u_t)

    def accumulate(rows):
        """(nt, un, k) slot rows -> (n_vnodes, k)."""
        k = rows.shape[-1]
        z = jnp.concatenate(
            [rows.reshape(nt * un, k), jnp.zeros((1, k), rows.dtype)]
        )
        return jnp.concatenate([z[g].sum(axis=1) for g in tiles.acc_map])

    def join(y):
        # (n_vnodes, C) accumulated rows -> global [u | p].
        return jnp.concatenate([y[:, :dim].T.reshape(-1), y[:n_p, dim]])

    def apply(x):
        x_t = gather_x(x)
        u_t, p_t = x_t[:, :, :dim], x_t[:, :un_p, dim]
        y_u = vel_rows(u_t) + jnp.einsum("tdvc,tc->tvd", G, p_t)
        y_p = jnp.einsum("tdcv,tvd->tc", H, u_t)
        rows = jnp.concatenate(
            [y_u, jnp.pad(y_p, ((0, 0), (0, un - un_p)))[:, :, None]], axis=2
        )
        return join(accumulate(rows))

    def apply_velocity_block(x):
        u_t = gather_x(x, vel_only=True)[:, :, :dim]
        y = accumulate(vel_rows(u_t))
        return jnp.concatenate([y.T.reshape(-1), jnp.zeros((n_p,), x.dtype)])

    def apply_divergence(x):
        u_t = gather_x(x, vel_only=True)[:, :, :dim]
        y_p = jnp.einsum("tdcv,tvd->tc", H, u_t)
        y = accumulate(jnp.pad(y_p, ((0, 0), (0, un - un_p)))[:, :, None])
        return y[:n_p, 0]

    apply.velocity_block = apply_velocity_block
    apply.divergence = apply_divergence
    return apply


# --- tile-RESIDENT Krylov representation ----------------------------------
#
# The gather + accumulation bracketing every tile-operator application
# costs ~7 ns per padded slot EACH WAY (2 x nt*un slots).  Keeping the
# Krylov vectors in the tile-local slot space removes it: interior slots
# (nodes private to one tile) already hold assembled values after the
# matvec, and only the two INTERFACE slabs exchange sums (~1/3 of the
# slots).  FGMRES runs on flat (nt*un*(dim+1),) vectors with the 0/1 owner
# mask as the inner-product weight (gmres.fgmres(weight=...)) — with
# consistent vectors this reproduces the nodal Krylov trajectory exactly.
# This is the halo layout's owned/ghost design at tile granularity
# (reference analog: the distributed Trilinos vectors' owned/ghosted maps,
# NavierStokes.cpp:96-101).


def to_tiles(fe: FEArrays, tiles: TileArrays, x):
    """Global nodal vector -> consistent flat tile-local (nt*un*(dim+1),)."""
    dim, nv, n_p, n_u = fe.dim, fe.n_vnodes, fe.n_p, fe.n_udofs
    u = x[:n_u].reshape(dim, nv).T
    p = jnp.pad(x[n_u:], (0, nv - n_p))
    up = jnp.concatenate([u, p[:, None]], axis=1)
    upz = jnp.concatenate([up, jnp.zeros((1, dim + 1), x.dtype)])
    return upz[tiles.tile_nodes].reshape(-1)


def from_tiles(fe: FEArrays, tiles: TileArrays, xt):
    """Consistent flat tile-local -> global nodal vector (owner slots)."""
    dim, n_p = fe.dim, fe.n_p
    rows = xt.reshape(-1, dim + 1)[tiles.own_slot]  # (n_vnodes, dim+1)
    return jnp.concatenate([rows[:, :dim].T.reshape(-1), rows[:n_p, dim]])


def exchange(tiles: TileArrays, rows):
    """(nt, un, k) per-tile PARTIAL rows -> consistent rows.

    Interface slots (two contiguous slabs) are summed across tiles and
    written back to every occurrence; interior slots pass through (their
    tile's contribution IS the assembled value)."""
    nt, un_p, w_vi, w_ei = tiles.n_tiles, tiles.un_p, tiles.w_vi, tiles.w_ei
    k = rows.shape[-1]
    slab = jnp.concatenate(
        [rows[:, :w_vi], rows[:, un_p : un_p + w_ei]], axis=1
    ).reshape(nt * (w_vi + w_ei), k)
    z = jnp.concatenate([slab, jnp.zeros((1, k), rows.dtype)])
    sums = jnp.concatenate([z[g].sum(axis=1) for g in tiles.if_acc])
    sums = jnp.concatenate([sums, jnp.zeros((1, k), rows.dtype)])
    back = sums[tiles.if_back]  # (nt, w_if, k); pad slots -> 0
    rows = rows.at[:, :w_vi].set(back[:, :w_vi])
    rows = rows.at[:, un_p : un_p + w_ei].set(back[:, w_vi:])
    return rows


def accumulate_p_slab(fe: FEArrays, tiles: TileArrays, y_p):
    """(nt, un_p) per-tile pressure-row partials -> (n_p,) nodal."""
    flat = y_p.reshape(-1, 1)
    z = jnp.concatenate([flat, jnp.zeros((1, 1), y_p.dtype)])
    return jnp.concatenate([z[g].sum(axis=1) for g in tiles.p_acc])[:, 0]


def gather_p_slab(fe: FEArrays, tiles: TileArrays, p):
    """(n_p,) nodal pressure -> (nt, un_p) consistent vertex-slab values."""
    pz = jnp.concatenate([p, jnp.zeros((1,), p.dtype)])
    idx = jnp.minimum(tiles.tile_nodes[:, : tiles.un_p], fe.n_p)
    return pz[idx]


def make_tile_operator_local(fe: FEArrays, tiles: TileArrays, blocks: TileBlocks):
    """Tile-space operator: consistent flat input -> consistent flat output,
    with ``.velocity_block`` (tile-space) and ``.divergence`` (-> nodal
    (n_p,), feeding the nodal Schur solve) attributes."""
    dim = fe.dim
    C = dim + 1
    nt, un, un_p = tiles.n_tiles, tiles.un, tiles.un_p
    S, V, G, H = blocks.S, blocks.V, blocks.G, blocks.H

    def vel_rows(u_t):
        if V is None:
            return jnp.einsum("tuv,tvd->tud", S, u_t)
        return jnp.einsum("tijuv,tvj->tui", V, u_t)

    def apply(xt):
        x_t = xt.reshape(nt, un, C)
        u_t, p_t = x_t[:, :, :dim], x_t[:, :un_p, dim]
        y_u = vel_rows(u_t) + jnp.einsum("tdvc,tc->tvd", G, p_t)
        y_p = jnp.einsum("tdcv,tvd->tc", H, u_t)
        rows = jnp.concatenate(
            [y_u, jnp.pad(y_p, ((0, 0), (0, un - un_p)))[:, :, None]], axis=2
        )
        return exchange(tiles, rows).reshape(-1)

    def velocity_block(xt):
        """Velocity rows only; the pressure column of the result is 0."""
        u_t = xt.reshape(nt, un, C)[:, :, :dim]
        y_u = exchange(tiles, vel_rows(u_t))
        return jnp.concatenate(
            [y_u, jnp.zeros((nt, un, 1), xt.dtype)], axis=2
        ).reshape(-1)

    def divergence(xt):
        """Pressure rows B u as a NODAL (n_p,) vector (Schur input)."""
        u_t = xt.reshape(nt, un, C)[:, :, :dim]
        y_p = jnp.einsum("tdcv,tvd->tc", H, u_t)
        return accumulate_p_slab(fe, tiles, y_p)

    apply.velocity_block = velocity_block
    apply.divergence = divergence
    return apply
