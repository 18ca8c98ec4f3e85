"""Cahouet-Chabard block-triangular preconditioner, TPU-native.

Structure preserved from the reference (NavierStokes.hpp:279-366):

    step 1:  z_u = A_vel^{-1} r_u        (approximate velocity solve)
    step 2:  t   = r_p - B z_u
    step 3:  z_p = -(rho/dt) K_p^{-1} t - theta*nu M_p^{-1} t

The ILU(1)/AMG/ILU ingredients — sequential triangular sweeps that do not
map to TPU — are replaced by spectrally equivalent parallel operations:

  * A_vel^{-1}: damped-Jacobi sweeps (the velocity block is mass-dominated
    at benchmark time steps, so a diagonal sweep is an effective smoother);
  * K_p^{-1}:   fixed-budget Jacobi-CG on the (static, regularized) pressure
    Laplacian — K_p += 1e-6 M_p exactly as the reference (cpp:536, 828);
  * M_p^{-1}:   lumped (row-sum) diagonal inverse.

Outlet-pinned pressure dofs and Dirichlet velocity dofs act as identity,
mirroring the constrained matrix rows.  The outer solver is *flexible*
GMRES, so the inner CG's slight nonstationarity is harmless.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..ops import operators
from ..ops.fe_arrays import FEArrays
from . import cg, chebyshev


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PressureOperators:
    """Static pressure-space data (built once; reference: cpp:529-538).

    The element matrices themselves stay in ``FEArrays`` (element-axis
    sharded on a device mesh); only the small global pressure-space vectors
    live here (replicated).

    Three K_p^{-1} strategies by pressure-space size:
      * ``dense``      — precomputed dense inverse (one MXU matmul/apply);
      * ``two_level``  — aggregation two-grid: Jacobi smoothing + a dense
                         coarse-aggregate inverse (the TPU-native stand-in
                         for the reference's AMG, NavierStokes.hpp:344-352),
                         for spaces too large to invert densely;
      * fallback       — fixed-budget Jacobi-CG.
    """

    kp_diag: Any  # (n_p,) diagonal of the regularized K_p
    mp_lumped: Any  # (n_p,) row-sum lumped mass
    pin_mask: Any  # (n_p,) bool — outlet-pinned dofs
    kp_inv: Any  # (n_p, n_p) dense inverse, or () when unused
    agg_ids: Any  # (n_p,) int32 aggregate of each vertex (two_level), or ()
    agg_gather: Any  # tuple of transpose maps for aggregate restriction, or ()
    kc_inv: Any  # (n_c, n_c) dense coarse inverse (two_level), or ()
    eps: float = dataclasses.field(metadata=dict(static=True))
    dense: bool = dataclasses.field(metadata=dict(static=True))
    two_level: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # Storage format of the dense inverse ("f32" | "f16" | "bf16x2") and the
    # power-of-two descale applied after an f16 matvec — the K_p^{-1} apply
    # is HBM-byte-bound (docs/roofline.json: 58% of peak at 4 B/entry), so
    # halving the bytes halves its time IF the preconditioner quality holds.
    kp_inv_storage: str = dataclasses.field(
        default="f32", metadata=dict(static=True)
    )
    kp_inv_scale: float = dataclasses.field(
        default=1.0, metadata=dict(static=True)
    )
    # --- P1-coarse velocity preconditioner statics (p-multigrid) ---------
    # The coarse space is the P1 vertex subspace of the P2 velocity field on
    # the SAME mesh; the coarse operator per component is the scalar
    # (rho/dt) M1 + theta nu K1 — assembled from the very same kp_e/mp_e
    # element matrices the Schur complement uses.
    vc_edge_verts: Any = ()  # (n_edges, 2) int32 endpoints of edge node n_p+i
    vc_gather: Any = ()  # transpose maps: per-vertex incident edge slots
    vc_mask1: Any = ()  # (n_p, dim) bool Dirichlet mask on coarse dofs
    vc_m1_diag: Any = ()  # (n_p,) assembled M1 diagonal
    vc_k1_diag: Any = ()  # (n_p,) assembled K1 diagonal
    p1_coarse: bool = dataclasses.field(default=False, metadata=dict(static=True))


def _dense_kp_inverse(fe: FEArrays, kp_e, pin_mask, cache_dir: str = "/tmp/ns_tpu_cache"):
    """Assemble, pin and invert K_p densely (host, f64), with a disk cache.

    The inverse is mesh-only data (reference assembles K_p once too,
    cpp:529-538); inverting an ~18k matrix costs ~1 minute once and is then
    memoized on disk keyed by the pressure connectivity + geometry.
    """
    import hashlib
    import os

    import numpy as np

    ep = np.asarray(fe.elems_p1)
    ke = np.asarray(kp_e, np.float64)
    pin = np.asarray(pin_mask)
    h = hashlib.sha1()
    h.update(ep.tobytes())
    h.update(np.asarray(ke, np.float32).tobytes())
    h.update(pin.tobytes())
    key = h.hexdigest()[:16]
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"kpinv_{fe.n_p}_{key}.npy")
    if os.path.exists(path):
        return np.load(path)

    K = np.zeros((fe.n_p, fe.n_p))
    rows = np.broadcast_to(ep[:, :, None], ke.shape)
    cols = np.broadcast_to(ep[:, None, :], ke.shape)
    np.add.at(K, (rows, cols), ke)
    K[pin, :] = 0.0
    K[:, pin] = 0.0
    K[pin, pin] = 1.0
    # ~2 n^3 flops: a few minutes at 18k on this host, once per mesh.
    K_inv = np.linalg.inv(K).astype(np.float32)
    tmp = path + ".tmp.npy"
    np.save(tmp, K_inv)
    os.replace(tmp, path)
    return K_inv


def _aggregate_vertices(coords: "np.ndarray", pin: "np.ndarray", target_size: int = 6):
    """Spatial grid aggregation of pressure vertices (host, one-time).

    Returns (agg_ids (n_p,) int32 with pinned vertices = -1, n_aggregates).
    Grid cells are sized so aggregates hold ~target_size vertices; empty
    cells are compressed away.
    """
    import numpy as np

    n_p, dim = coords.shape
    n_c_target = max(1, n_p // target_size)
    lo = coords.min(axis=0)
    span = coords.max(axis=0) - lo + 1e-12
    # cells per axis proportional to extent, product ~ n_c_target
    rel = span / span.prod() ** (1.0 / dim)
    n_axis = np.maximum(1, np.round(rel * n_c_target ** (1.0 / dim))).astype(int)
    cell = np.minimum(((coords - lo) / span * n_axis).astype(np.int64), n_axis - 1)
    flat = cell[:, 0]
    for d in range(1, dim):
        flat = flat * n_axis[d] + cell[:, d]
    flat[pin] = -1
    uniq, inv = np.unique(flat, return_inverse=True)
    # Reserve -1 (pinned) as aggregate -1.
    has_pin = uniq[0] == -1
    agg = inv - 1 if has_pin else inv
    n_c = len(uniq) - (1 if has_pin else 0)
    return agg.astype(np.int32), int(n_c)


def _two_level_coarse_inverse(fe: FEArrays, kp_e, pin, agg, n_c, cache_dir="/tmp/ns_tpu_cache"):
    """K_c = P0^T K_p P0 over aggregates, densely inverted (host, cached)."""
    import hashlib
    import os

    import numpy as np

    ep = np.asarray(fe.elems_p1)
    ke = np.asarray(kp_e, np.float64)
    h = hashlib.sha1()
    h.update(ep.tobytes())
    h.update(np.asarray(ke, np.float32).tobytes())
    h.update(agg.tobytes())
    path = os.path.join(cache_dir, f"kcinv_{n_c}_{h.hexdigest()[:16]}.npy")
    os.makedirs(cache_dir, exist_ok=True)
    if os.path.exists(path):
        return np.load(path)
    Kc = np.zeros((n_c + 1, n_c + 1))
    rows = agg[np.broadcast_to(ep[:, :, None], ke.shape)]
    cols = agg[np.broadcast_to(ep[:, None, :], ke.shape)]
    np.add.at(Kc, (rows, cols), ke)  # aggregate -1 lands in the last row/col
    Kc = Kc[:n_c, :n_c]
    Kc[np.arange(n_c), np.arange(n_c)] += 1e-12 * np.abs(Kc).max()
    Kc_inv = np.linalg.inv(Kc).astype(np.float32)
    tmp = path + ".tmp.npy"
    np.save(tmp, Kc_inv)
    os.replace(tmp, path)
    return Kc_inv


def _build_p1_coarse(fe: FEArrays, mesh, vel_mask):
    """Host-side statics for the P1-coarse velocity preconditioner.

    Edge-node endpoints are reconstructed from the element connectivity (an
    edge node at local position dim+1+i spans TRI/TET_EDGES[i] of its
    element); the vertex<-edge transpose map turns the P^T restriction into
    a bucketed row gather.
    """
    import numpy as np

    from ..ops import elements as el
    from ..ops.fe_arrays import _bucketed_transpose_map

    dim, n_p = fe.dim, fe.n_p
    e2 = np.asarray(fe.elems_p2)[: mesh.n_el_real]
    n_edges = fe.n_vnodes - n_p
    edge_verts = np.zeros((n_edges, 2), np.int64)
    edges = el.TRI_EDGES if dim == 2 else el.TET_EDGES
    for i, (a, b) in enumerate(edges):
        ids = e2[:, dim + 1 + i] - n_p
        edge_verts[ids, 0] = e2[:, a]
        edge_verts[ids, 1] = e2[:, b]
    vc_gather = tuple(
        jnp.asarray(g) for g in _bucketed_transpose_map(edge_verts, n_p, [])
    )
    mask1 = np.asarray(vel_mask)[: fe.n_udofs].reshape(dim, fe.n_vnodes)[:, :n_p].T

    k1_diag = jnp.zeros((n_p,), fe.kp_e.dtype).at[fe.elems_p1].add(
        jnp.diagonal(fe.kp_e, axis1=1, axis2=2)
    )
    m1_diag = jnp.zeros((n_p,), fe.mp_e.dtype).at[fe.elems_p1].add(
        jnp.diagonal(fe.mp_e, axis1=1, axis2=2)
    )
    return dict(
        vc_edge_verts=jnp.asarray(edge_verts, jnp.int32),
        vc_gather=vc_gather,
        vc_mask1=jnp.asarray(mask1),
        vc_m1_diag=m1_diag,
        vc_k1_diag=k1_diag,
        p1_coarse=True,
    )


def p1_restrict(pops: PressureOperators, r2):
    """P^T: (n_vnodes, dim) fine velocity residual -> (n_p, dim) coarse.

    r1[v] = r2[v] + 0.5 * sum over edges incident to v of r2[edge] — the
    transpose of quadratic-midpoint interpolation, evaluated as a bucketed
    gather (scatters with duplicates serialize on TPU).
    """
    n_p = pops.vc_m1_diag.shape[0]
    r_edges = r2[n_p:]
    vals = jnp.broadcast_to(
        0.5 * r_edges[:, None, :], (r_edges.shape[0], 2, r_edges.shape[1])
    ).reshape(-1, r_edges.shape[1])
    flat = jnp.concatenate([vals, jnp.zeros((1, vals.shape[1]), vals.dtype)], axis=0)
    acc = jnp.concatenate([flat[g].sum(axis=1) for g in pops.vc_gather])
    return r2[:n_p] + acc


def p1_prolong(pops: PressureOperators, z1):
    """P: (n_p, dim) coarse -> (n_vnodes, dim); edge nodes = endpoint mean."""
    mids = 0.5 * (z1[pops.vc_edge_verts[:, 0]] + z1[pops.vc_edge_verts[:, 1]])
    return jnp.concatenate([z1, mids], axis=0)


def make_p1_coarse_solve(fe: FEArrays, pops: PressureOperators, c_dt, c_nu,
                         iters: int, gamma=None) -> Callable:
    """Return solve(r1) ~ A1^{-1} r1 with A1 = c_dt M1 + c_nu K1 per component.

    A1 is SPD and shares the pressure-space element matrices (mp_e, kp_e are
    the P1 mass/stiffness of the same mesh); the solve is a fixed-budget
    Jacobi-PCG, all dim components in one pass (row gathers).  Dirichlet
    coarse dofs act as identity-excluded (residual zeroed, correction
    zeroed).

    ``gamma``: grad-div coefficient of the fine operator (SUPG cases).  On
    P1 the term is rank-one per element — gamma vol_e g1[c,d] (g1 : z) — so
    capturing the component coupling costs two extra tiny einsums (without
    it the component-decoupled coarse correction is spectrally wrong for
    grad-div-stabilized systems: measured 2x MORE Krylov iterations on
    3D-1Z).
    """
    mask1 = pops.vc_mask1
    A1_e = c_dt * fe.mp_e + c_nu * fe.kp_e
    diag1 = c_dt * pops.vc_m1_diag + c_nu * pops.vc_k1_diag
    diag1 = jnp.maximum(diag1, 1e-30)[:, None] * jnp.ones_like(mask1, diag1.dtype)
    g1 = vol = None
    if gamma is not None:
        g1 = fe.phys_grads_p1()  # (n_el, n1, dim)
        vol = fe.jxw.sum(axis=1)
        gd_diag = gamma * vol[:, None, None] * g1 * g1  # (n_el, n1, dim)
        diag1 = diag1 + fe.accumulate_p_rows(gd_diag)
    diag1 = jnp.where(mask1, 1.0, diag1)

    def apply_a1(z1):
        z1f = jnp.where(mask1, 0.0, z1)
        z_e = z1f[fe.elems_p1]  # (n_el, n1, dim)
        y_e = jnp.einsum("ecf,efd->ecd", A1_e, z_e)
        if gamma is not None:
            s = jnp.einsum("efg,efg->e", g1, z_e)  # element divergence sum
            y_e = y_e + gamma * (vol * s)[:, None, None] * g1
        y = fe.accumulate_p_rows(y_e)
        return jnp.where(mask1, z1, y)

    def solve(r1):
        r1f = jnp.where(mask1, 0.0, r1)
        z1 = cg.pcg(apply_a1, r1f, diag1, iters=iters)
        return jnp.where(mask1, 0.0, z1)

    return solve


def build_pressure_operators(
    fe: FEArrays, pin_mask, kp_regularization: float = 1e-6, dense_max: int = 0,
    coords=None, two_level_min: int = 0, mesh=None, vel_mask=None,
    p1_coarse: bool = False, kp_inv_storage: str = "f32",
) -> PressureOperators:
    kp_e = fe.kp_e + kp_regularization * fe.mp_e
    # Diagonal and lumped mass via scatter-add over pressure connectivity.
    n_p = fe.n_p
    kp_diag = jnp.zeros((n_p,), kp_e.dtype).at[fe.elems_p1].add(
        jnp.diagonal(kp_e, axis1=1, axis2=2)
    )
    mp_lumped = jnp.zeros((n_p,), kp_e.dtype).at[fe.elems_p1].add(fe.mp_e.sum(axis=2))
    kp_diag = jnp.where(pin_mask, 1.0, kp_diag)
    mp_lumped = jnp.where(pin_mask, 1.0, mp_lumped)

    # Small pressure spaces: precompute the exact dense inverse of the
    # (pinned, regularized) Laplacian once — each preconditioner application
    # is then a single MXU matmul instead of a chain of CG kernels.  Larger
    # spaces use the aggregation two-grid (needs ``coords``); Jacobi-CG is
    # the last fallback.
    dense = 0 < fe.n_p <= dense_max
    two_level = (not dense) and coords is not None and fe.n_p > two_level_min
    agg_ids = jnp.zeros(())
    agg_gather = ()
    kc_inv = jnp.zeros(())
    if two_level:
        import numpy as np

        from ..ops.fe_arrays import _bucketed_transpose_map

        agg, n_c = _aggregate_vertices(np.asarray(coords), np.asarray(pin_mask))
        kc_inv = jnp.asarray(_two_level_coarse_inverse(fe, kp_e, pin_mask, agg, n_c))
        # Restriction r_c = sum over vertices of each aggregate: transpose
        # map over the (n_p, 1) "element" list (pinned -> sentinel).
        verts = np.where(agg < 0, n_c, agg).astype(np.int64)[:, None]
        agg_gather = tuple(
            jnp.asarray(g) for g in _bucketed_transpose_map(verts, n_c + 1, [n_c])
        )
        agg_ids = jnp.asarray(np.where(agg < 0, n_c, agg).astype(np.int32))
    kp_inv = jnp.zeros(())
    kp_inv_scale = 1.0
    if dense:
        # Storage ladder for the byte-bound dense inverse (each apply reads
        # the full matrix from HBM):
        #   * "f32"    (default) — 4 B/entry; NAIVE bf16 destroys the
        #     preconditioner (measured: 2D-2 FGMRES stops converging —
        #     8-bit mantissa), hence the two refined options;
        #   * "f16"    — 2 B/entry, HALF the bytes; IEEE half's 11-bit
        #     mantissa is 8x tighter than bf16.  Entries are pre-scaled by
        #     a power of two so the largest magnitude sits near 2^14
        #     (range headroom for the f32->f16 cast), descale after the
        #     matvec;
        #   * "bf16x2" — hi/lo bf16 split (~16-bit effective mantissa, same
        #     4 B/entry as f32 but native-MXU bf16 passes).
        K32 = jnp.asarray(_dense_kp_inverse(fe, kp_e, pin_mask), jnp.float32)
        if kp_inv_storage == "f16":
            import numpy as np

            amax = float(jnp.max(jnp.abs(K32)))
            s = 2.0 ** np.floor(np.log2(16384.0 / max(amax, 1e-30)))
            kp_inv = (K32 * s).astype(jnp.float16)
            kp_inv_scale = 1.0 / s
        elif kp_inv_storage == "bf16x2":
            hi = K32.astype(jnp.bfloat16)
            lo = (K32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            kp_inv = (hi, lo)
        elif kp_inv_storage == "f32":
            kp_inv = K32.astype(kp_diag.dtype)
        else:
            raise ValueError(f"unknown kp_inv_storage {kp_inv_storage!r}")

    vc = {}
    if p1_coarse:
        if mesh is None or vel_mask is None:
            raise ValueError("p1_coarse needs mesh and vel_mask")
        vc = _build_p1_coarse(fe, mesh, vel_mask)

    return PressureOperators(
        kp_diag=kp_diag, mp_lumped=mp_lumped, pin_mask=pin_mask,
        kp_inv=kp_inv, agg_ids=agg_ids, agg_gather=agg_gather, kc_inv=kc_inv,
        eps=kp_regularization, dense=dense, two_level=two_level,
        kp_inv_storage=kp_inv_storage, kp_inv_scale=kp_inv_scale, **vc,
    )


def apply_kp_inv(pops: PressureOperators, t_free):
    """Dense K_p^{-1} @ t_free under the configured storage format.

    All formats accumulate in f32 (``preferred_element_type``); only the
    HBM-resident matrix (and, for the reduced formats, the 1-vector cast of
    ``t_free``) is in reduced precision.
    """
    if pops.kp_inv_storage == "f16":
        y = jnp.matmul(
            pops.kp_inv,
            t_free.astype(jnp.float16),
            preferred_element_type=jnp.float32,
        )
        return (y * pops.kp_inv_scale).astype(t_free.dtype)
    if pops.kp_inv_storage == "bf16x2":
        hi, lo = pops.kp_inv
        th = t_free.astype(jnp.bfloat16)
        tl = (t_free - th.astype(t_free.dtype)).astype(jnp.bfloat16)
        # One pass over hi serves both columns (matrix reads dominate).
        yh = jnp.matmul(
            hi, jnp.stack([th, tl], axis=1),
            preferred_element_type=jnp.float32,
        )
        yl = jnp.matmul(lo, th, preferred_element_type=jnp.float32)
        return (yh[:, 0] + yh[:, 1] + yl).astype(t_free.dtype)
    return jnp.matmul(
        pops.kp_inv,
        t_free.astype(pops.kp_inv.dtype),
        preferred_element_type=t_free.dtype,
    ).astype(t_free.dtype)


def apply_kp(fe: FEArrays, pops: PressureOperators, x_p):
    """(K_p + eps M_p) x on the pressure space, identity on pinned dofs."""
    x_free = jnp.where(pops.pin_mask, 0.0, x_p)
    x_e = x_free[fe.elems_p1]
    y_e = jnp.einsum("ecf,ef->ec", fe.kp_e + pops.eps * fe.mp_e, x_e)
    y = fe.accumulate_p(y_e)
    return jnp.where(pops.pin_mask, x_p, y)


def make_kp_solve(fe: FEArrays, pops: PressureOperators, kp_iters: int = 30,
                  twolevel_cycles: int = 1) -> Callable:
    """Return kp_solve(t_free) ~ K_p^{-1} t on GLOBAL pressure vectors.

    Strategy by pressure-space size (see PressureOperators): exact dense
    inverse (one MXU matmul), aggregation two-grid V-cycles, or fixed-budget
    Jacobi-CG.  ``t_free`` must already be zero on pinned dofs.  Shared by
    the single-chip Cahouet-Chabard and the halo-layout preconditioner
    (parallel/halo_solver.py), which gathers its pressure residual to the
    replicated global space first (coarse/dense solves are replicated in
    distributed AMG stacks too).
    """
    kp_apply = lambda x: apply_kp(fe, pops, x)

    def kp_solve(t_free):
        if pops.dense:
            return apply_kp_inv(pops, t_free)
        if pops.two_level:
            # Aggregation two-grid V-cycle: damped-Jacobi smooth, dense
            # coarse solve on the MXU, damped-Jacobi post-smooth.
            n_c = pops.kc_inv.shape[0]
            omega = 0.8

            def smooth(z, sweeps):
                for _ in range(sweeps):
                    r = jnp.where(pops.pin_mask, 0.0, t_free - kp_apply(z))
                    z = z + omega * r / pops.kp_diag
                return z

            z = omega * t_free / pops.kp_diag
            for _ in range(twolevel_cycles):
                z = smooth(z, 1)
                r1 = jnp.where(pops.pin_mask, 0.0, t_free - kp_apply(z))
                flat = jnp.concatenate([r1, jnp.zeros((1,), r1.dtype)])
                r_c = jnp.concatenate(
                    [flat[g].sum(axis=1) for g in pops.agg_gather]
                )[:n_c]
                z_c = jnp.matmul(
                    pops.kc_inv, r_c.astype(pops.kc_inv.dtype),
                    preferred_element_type=r_c.dtype,
                ).astype(r_c.dtype)
                z = z + jnp.concatenate([z_c, jnp.zeros((1,), z_c.dtype)])[pops.agg_ids]
                z = smooth(z, 2)
            return z
        return cg.pcg(kp_apply, t_free, pops.kp_diag, iters=kp_iters)

    return kp_solve


def make_cahouet_chabard(
    fe: FEArrays,
    pops: PressureOperators,
    A_e,  # per-step element matrices
    mask,  # (n_dofs,) Dirichlet mask
    dt,
    theta,
    nu,
    rho,
    vel_sweeps: int = 2,
    kp_iters: int = 30,
    vel_method: str = "chebyshev",
    vel_degree: int = 6,
    vel_apply: Callable | None = None,
    div_apply: Callable | None = None,
    diag=None,
    nodeblock_inv=None,  # (n_vnodes, dim, dim) for vel_method="nodeblock"
    twolevel_cycles: int = 1,
    p1_iters: int = 8,  # coarse PCG budget for vel_method="p1coarse*"
    schur: str = "cc",  # "cc" (Cahouet-Chabard) | "pcd"
    u_adv=None,  # (n_vnodes, dim) advection field (u* / u_k) for schur="pcd"
    gd_gamma=None,  # grad-div coefficient for the P1 coarse level (SUPG cases)
    structure: str = "triangular",  # "triangular" | "diagonal"
    schur_nu_mass=None,  # Schur M_p coefficient override (config.schur_gd_mass)
) -> Callable:
    """Return precond(r) -> z for the current step's system.

    ``vel_apply`` / ``div_apply`` optionally override the block applications
    (the quadrature-path operators); defaults use the element matrices.
    ``diag``: precomputed global matrix diagonal — the quadrature path
    supplies it (assembly.oseen_rhs_diag) so ``A_e`` may be None.

    ``structure="diagonal"`` exposes the reference's
    ``PreconditionBlockDiagonal`` (NavierStokes.hpp:242-277): the velocity
    solve and the pressure solve applied independently — no divergence
    coupling (``t = r_p`` instead of ``r_p - B z_u``).  Deviation: the
    pressure block is the same Cahouet-Chabard Schur action the triangular
    path uses, not the reference's literal ILU(M_p) — an unscaled mass
    solve is mis-scaled by ~dt/rho on the transient Schur complement and
    stalls FGMRES at any usable dt (measured: 3000 its unconverged vs 59;
    PARITY.md).
    """
    if structure not in ("triangular", "diagonal"):
        raise ValueError(f"unknown precond structure {structure!r}")
    if diag is None:
        diag = operators.extract_diagonal(fe, A_e, mask)
    n_u = fe.n_udofs

    kp_solve = make_kp_solve(fe, pops, kp_iters=kp_iters, twolevel_cycles=twolevel_cycles)
    if vel_apply is None:
        vel_apply = lambda z: operators.velocity_block_apply(fe, A_e, mask, z)
    if div_apply is None:
        div_apply = lambda z: operators.divergence_block_apply(fe, A_e, mask, z)

    lmax = None
    if vel_method == "chebyshev":
        # Spectrum bound of D^{-1} A_vel, re-estimated for each step's
        # operator (convection changes it); reduction-light power iteration.
        probe = jnp.ones((fe.n_dofs,), diag.dtype).at[n_u:].set(0.0)
        lmax = chebyshev.estimate_lmax(vel_apply, diag, probe, iters=8)

    uadv_q = None
    if schur == "pcd":
        if u_adv is None:
            raise ValueError("schur='pcd' needs the advection field u_adv")
        uadv_q = jnp.einsum("qa,ead->eqd", fe.p2_val, u_adv[fe.elems_p2])

    coarse_solve = None
    vmask2 = None
    if vel_method in ("p1coarse", "p1coarse_mult"):
        if not pops.p1_coarse:
            raise ValueError(
                "vel_method='p1coarse' needs build_pressure_operators(..., "
                "p1_coarse=True)"
            )
        coarse_solve = make_p1_coarse_solve(
            fe, pops, rho / dt, theta * nu, iters=p1_iters, gamma=gd_gamma
        )
        vmask2 = mask[:n_u].reshape(fe.dim, fe.n_vnodes).T

    def precond(r):
        # --- step 1: approximate velocity solve --------------------------
        # (ILU(1) in the reference, NavierStokes.hpp:301-304; here a
        # Chebyshev polynomial of the Jacobi-scaled block, or plain sweeps.)
        r_u = r.at[n_u:].set(0.0)
        if vel_method == "chebyshev":
            z = chebyshev.chebyshev(vel_apply, r_u, diag, lmax, degree=vel_degree)
        elif vel_method in ("p1coarse", "p1coarse_mult"):
            # p-multigrid two-level: Jacobi fine sweep + a PCG-solved coarse
            # correction in the P1 vertex subspace (the TPU stand-in for the
            # reference's ILU(1), NavierStokes.hpp:301-304 — the coarse
            # level supplies the long-range coupling a diagonal sweep lacks,
            # at ~0.15x an operator application per coarse iteration).
            r2 = r_u[:n_u].reshape(fe.dim, fe.n_vnodes).T
            rf = jnp.where(vmask2, 0.0, r2)
            z1 = coarse_solve(p1_restrict(pops, rf))
            zc2 = jnp.where(vmask2, 0.0, p1_prolong(pops, z1))
            zc = jnp.concatenate(
                [zc2.T.reshape(-1), jnp.zeros((fe.n_dofs - n_u,), r.dtype)]
            )
            if vel_method == "p1coarse_mult":
                # Multiplicative: post-smooth the coarse correction with one
                # Jacobi sweep on the fine residual (one velocity apply).
                resid = r_u - vel_apply(zc)
                resid = resid.at[n_u:].set(0.0)
                z = zc + resid / diag
            else:
                # Additive two-level (no fine operator application).
                z = r_u / diag + zc
        elif vel_method == "nodeblock":
            # dim x dim node-diagonal blocks: captures the grad-div /
            # SUPG component coupling that scalar Jacobi ignores.
            nv = nodeblock_inv.shape[0]
            ru = r[:n_u].reshape(fe.dim, nv)
            zu = jnp.einsum("ndf,fn->dn", nodeblock_inv, ru).reshape(-1)
            z = jnp.concatenate([zu, jnp.zeros((fe.n_dofs - n_u,), r.dtype)])
        else:
            z = r_u / diag
            for _ in range(max(vel_sweeps - 1, 0)):
                resid = r_u - vel_apply(z)
                resid = resid.at[n_u:].set(0.0)
                z = z + 0.8 * resid / diag
        z_u = z.at[n_u:].set(0.0)

        if structure == "diagonal":
            # Block-diagonal (hpp:263-268): the two block solves applied
            # independently — no divergence coupling.  Deviation from the
            # reference's literal ILU(M_p) pressure block: the same
            # Cahouet-Chabard Schur action as the triangular path, applied
            # to r_p directly (PARITY.md) — an unscaled M_p^{-1} is
            # mis-scaled by ~dt/rho on the transient Schur complement and
            # stalls FGMRES at any usable dt.
            return z_u.at[n_u:].set(schur_act(r[n_u:]))

        # --- step 2: t = r_p - B z_u ------------------------------------
        t = r[n_u:] - div_apply(z_u)

        # --- step 3: Schur action ----------------------------------------
        z_p = schur_act(t)

        return z_u.at[n_u:].set(z_p)

    schur_act = make_schur_action(
        fe, pops, kp_solve, dt=dt, theta=theta, nu=nu, rho=rho,
        schur=schur, uadv_q=uadv_q, nu_mass=schur_nu_mass,
    )
    return precond


def make_schur_action(
    fe: FEArrays, pops: PressureOperators, kp_solve, *, dt, theta, nu, rho,
    schur: str = "cc", uadv_q=None, nu_mass=None,
) -> Callable:
    """Return schur(t) -> z_p, the approximate -S^{-1} t (nodal pressure
    space).  Shared by the nodal and tile-resident preconditioners.

    ``nu_mass`` overrides the coefficient of the M_p^{-1} term (the
    grad-div-aware Schur uses nu + gamma there, config.schur_gd_mass)."""
    nu_m = nu if nu_mass is None else nu_mass

    def schur_act(t):
        t_free = jnp.where(pops.pin_mask, 0.0, t)
        kp_inv_t = kp_solve(t_free)
        if schur == "pcd":
            # Pressure convection-diffusion (Elman-Silvester-Wathen):
            #   S^{-1} ~ -M_p^{-1} F_p K_p^{-1},
            #   F_p = (rho/dt) M_p + theta (nu K_p + N_p(u*)).
            # With N_p dropped this reduces to Cahouet-Chabard
            # ((rho/dt) K_p^{-1} + theta nu M_p^{-1}) only up to the
            # lumped-mass commutation (M_lump^{-1} M_p K_p^{-1} vs K_p^{-1};
            # exact in the consistent-mass limit) and the regularized-vs-raw
            # K_p pairing — do NOT rely on exact equivalence when validating
            # solver changes (tests assert ~0.35 relative agreement on the
            # pressure rows).  The convection term
            # N_p y = int psi (u* . grad y) adds the reaction the reference's
            # CC preconditioner ignores — config-gated, default "cc".
            y = jnp.where(pops.pin_mask, 0.0, kp_inv_t)
            y_e = y[fe.elems_p1]
            AF_e = (rho / dt) * fe.mp_e + (theta * nu) * fe.kp_e
            w = fe.accumulate_p(jnp.einsum("ecf,ef->ec", AF_e, y_e))
            g1p = fe.phys_grads_p1()
            gy = jnp.einsum("ec,ecd->ed", y_e, g1p)  # grad y, const/element
            adv = jnp.einsum("eqd,ed->eq", uadv_q, gy)
            w = w + theta * fe.accumulate_p(
                jnp.einsum("eq,qc,eq->ec", fe.jxw, fe.p1_val, adv)
            )
            z_p = -jnp.where(pops.pin_mask, 0.0, w) / pops.mp_lumped
        else:
            z_p = -(rho / dt) * kp_inv_t - (theta * nu_m) * (t_free / pops.mp_lumped)
        return jnp.where(pops.pin_mask, t, z_p)

    return schur_act


def make_cahouet_chabard_local(
    fe: FEArrays,
    tiles,  # ops.tile_operator.TileArrays
    pops: PressureOperators,
    op_local,  # tile-space operator (make_tile_operator_local)
    mask,  # (n_dofs,) nodal Dirichlet mask
    mask_t,  # flat tile-local Dirichlet mask (to_tiles of mask)
    diag_t,  # flat tile-local matrix diagonal (to_tiles of the global diag)
    *,
    dt,
    theta,
    nu,
    rho,
    vel_method: str = "p1coarse_mult",
    p1_iters: int = 2,
    kp_iters: int = 30,
    twolevel_cycles: int = 1,
    schur: str = "cc",
    u_adv=None,
    gd_gamma=None,
    structure: str = "triangular",
    schur_nu_mass=None,  # Schur M_p coefficient override (config.schur_gd_mass)
) -> Callable:
    """Tile-RESIDENT Cahouet-Chabard: precond(r) on consistent flat
    tile-local vectors (ops/tile_operator.py docstring).

    Identical mathematics to :func:`make_cahouet_chabard` — the velocity
    two-level solve, divergence and Schur action are the same operators;
    only the vector representation differs (the Schur core and the P1
    coarse solve stay nodal — their spaces are small).  Supports the
    measured-best velocity smoothers (jacobi / p1coarse / p1coarse_mult).
    """
    from ..ops import tile_operator as tileop

    if vel_method not in ("jacobi", "p1coarse", "p1coarse_mult"):
        raise NotImplementedError(
            f"tile-resident Krylov supports jacobi/p1coarse/p1coarse_mult, "
            f"not {vel_method!r}"
        )
    if structure not in ("triangular", "diagonal"):
        raise ValueError(f"unknown precond structure {structure!r}")
    dim, C = fe.dim, fe.dim + 1
    nt, un, un_p = tiles.n_tiles, tiles.un, tiles.un_p
    n_p, n_u, nv = fe.n_p, fe.n_udofs, fe.n_vnodes

    kp_solve = make_kp_solve(
        fe, pops, kp_iters=kp_iters, twolevel_cycles=twolevel_cycles
    )
    uadv_q = None
    if schur == "pcd":
        if u_adv is None:
            raise ValueError("schur='pcd' needs the advection field u_adv")
        uadv_q = jnp.einsum("qa,ead->eqd", fe.p2_val, u_adv[fe.elems_p2])
    schur_act = make_schur_action(
        fe, pops, kp_solve, dt=dt, theta=theta, nu=nu, rho=rho,
        schur=schur, uadv_q=uadv_q, nu_mass=schur_nu_mass,
    )

    coarse_solve = None
    vmask2 = None
    if vel_method in ("p1coarse", "p1coarse_mult"):
        if not pops.p1_coarse:
            raise ValueError(
                "vel_method='p1coarse' needs build_pressure_operators(..., "
                "p1_coarse=True)"
            )
        coarse_solve = make_p1_coarse_solve(
            fe, pops, rho / dt, theta * nu, iters=p1_iters, gamma=gd_gamma
        )
        vmask2 = mask[:n_u].reshape(dim, nv).T

    def vel_apply_t(z):
        """Identity on constrained rows, velocity block elsewhere (the
        tile-space mirror of the nodal vel_apply wrapper)."""
        zf = jnp.where(mask_t, 0.0, z)
        y = op_local.velocity_block(zf)
        return jnp.where(mask_t, z, y)

    def zero_p_col(zf):
        return zf.reshape(nt, un, C).at[:, :, dim].set(0.0).reshape(-1)

    def precond(r):
        r_rows = r.reshape(nt, un, C)
        r_nodal = r.reshape(-1, C)[tiles.own_slot]  # (n_vnodes, C)
        r_uf = zero_p_col(r)

        # --- step 1: approximate velocity solve -------------------------
        if vel_method in ("p1coarse", "p1coarse_mult"):
            rf2 = jnp.where(vmask2, 0.0, r_nodal[:, :dim])
            z1 = coarse_solve(p1_restrict(pops, rf2))
            zc2 = jnp.where(vmask2, 0.0, p1_prolong(pops, z1))
            zc_t = jnp.concatenate(
                [zc2, jnp.zeros((1, dim), zc2.dtype)]
            )[tiles.tile_nodes]  # (nt, un, dim)
            zc_f = jnp.concatenate(
                [zc_t, jnp.zeros((nt, un, 1), zc2.dtype)], axis=2
            ).reshape(-1)
            if vel_method == "p1coarse_mult":
                resid = zero_p_col(r_uf - vel_apply_t(zc_f))
                z_u = zc_f + resid / diag_t
            else:
                z_u = r_uf / diag_t + zc_f
        else:
            z_u = r_uf / diag_t
        z_u = zero_p_col(z_u)

        if structure == "diagonal":
            # Block-diagonal (hpp:263-268): Schur action on r_p directly,
            # no divergence coupling (deviation from the reference's
            # ILU(M_p) — see the nodal factory above and PARITY.md).
            z_p = schur_act(r_nodal[:n_p, dim])
        else:
            # --- step 2: t = r_p - B z_u (nodal) ------------------------
            t = r_nodal[:n_p, dim] - op_local.divergence(
                jnp.where(mask_t, 0.0, z_u)
            )
            # --- step 3: Schur action (nodal) -> back to the vertex slab
            z_p = schur_act(t)
        zp_t = tileop.gather_p_slab(fe, tiles, z_p)  # (nt, un_p)
        rows = jnp.concatenate(
            [
                z_u.reshape(nt, un, C)[:, :, :dim],
                jnp.pad(zp_t, ((0, 0), (0, un - un_p)))[:, :, None],
            ],
            axis=2,
        )
        return rows.reshape(-1)

    return precond
