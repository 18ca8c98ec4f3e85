"""The FULL time loop on the halo-exchange layout.

``HaloNavierStokesSolver`` runs the complete time step — assembly (Oseen or
Newton), dt-retry ladder / damped Newton iteration, FGMRES with the
Cahouet-Chabard preconditioner,
benchmark functionals — with the solution DISTRIBUTED across a device mesh
in owned-node blocks, communicating O(interface) ppermute messages per
operator application.  This is the end-state of the reference's MPI domain
decomposition (reference: NavierStokes.cpp:56-61 partitioning, 205-220
owned/ghosted vectors, 527-528 compress(add), 1044-1327 run()) rebuilt
TPU-native:

  * only the operator application and the assembly enter ``shard_map``;
    inside, the strip's local ``FEArrays`` (parallel/halo_fe.py) drives the
    IDENTICAL kernels as the single-chip path (assembly.oseen_rhs_diag,
    matfree.make_system_operator) with ghost import/export around them;
  * the Krylov algebra (CGS2 projections, norms, axpys) runs on flat
    block-sharded vectors — XLA's SPMD partitioner inserts one psum per dot
    product, the analog of the implicit MPI reductions in deal.II's GMRES;
  * per-step advection tables are computed ONCE per ladder trial and passed
    into the matvec, so Krylov iterations never re-interpolate u*;
  * the Cahouet-Chabard preconditioner runs owned-local (Jacobi velocity
    sweep, lumped M_p) INCLUDING the Schur K_p solve: the two-grid / CG
    strategies run strip-local with O(interface) pressure exchanges and an
    O(n_c) psum for the coarse residual (parallel/halo_schur.py); only the
    dense strategy (small pressure spaces) gathers to the replicated
    global space (coarse/dense solves are replicated in distributed AMG
    stacks too);
  * step 2 of the preconditioner applies ONLY the divergence block (one
    pressure-sized halo export), not a full matvec;
  * the host-side dt-retry ladder, trial parameterization, warm starting
    and metrics logging are inherited from ``NavierStokesSolver`` — one
    compiled attempt program serves every ladder trial.

Equivalence with the single-device solver (same trajectory to the solve
tolerance) is asserted on an 8-device CPU mesh in tests/test_halo.py.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import NonlinearMethod, SolverConfig, TimeScheme
from ..models.solver import NavierStokesSolver, State, StepMetrics
from ..ops import assembly, functionals, matfree, tile_operator
from ..solvers import chebyshev, gmres, preconditioners
from . import halo_fe as hf
from . import halo_schur
from . import halo_tiles
from . import sharding


def _pack(tables):
    return tuple(t for t in tables if t is not None)


def _unpack(packed, use_supg: bool, newton: bool):
    it = iter(packed)
    uadv_q = next(it)
    uadv_ref = next(it)
    g_adv = next(it) if newton else None
    tau = next(it) if use_supg else None
    return uadv_q, uadv_ref, g_adv, tau


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloStatics:
    """Mesh-static local vectors + per-strip functional tables, built once."""

    mask: Any  # (P, n_ld) bool — Dirichlet rows
    pin_p: Any  # (P, n_lp) bool — outlet-pinned pressure dofs
    mp_p: Any  # (P, n_lp) lumped pressure mass (1 at pads/pins)
    # Global fine-velocity Dirichlet mask (n_vnodes, dim) for the replicated
    # P1-coarse velocity correction — a jit ARGUMENT leaf like everything
    # else here (closure constants are lowered host-side; repo rule).
    vel_mask_glob: Any
    # Per-strip benchmark-functional tables (stacked ForceTables leaves with
    # LOCAL element ids; padded faces carry jxw=0).  The functionals then run
    # inside shard_map on owned+halo fields with one psum — no global gather
    # (the reference's functionals are MPI-summed partial integrals too,
    # NavierStokes.cpp:982-985, 898-900).
    force: Any  # ForceTables with leading (P,) axis
    probe_elems: Any  # (P, 2) int32 local element of each probe point (0 pad)
    probe_bary: Any  # (P, 2, n1) barycentric shape values
    probe_valid: Any  # (P, 2) 1.0 where this strip owns the probe element
    # Owned-valued ones-velocity probe for the Chebyshev lmax power
    # iteration (precond_vel_method="chebyshev"): 1.0 at owned REAL
    # velocity slots, 0 at pads/halo/pressure — the owned-block
    # representation of the single-chip probe (ones.at[n_u:].set(0)), so
    # both layouts estimate the identical spectrum bound.
    probe_u: Any = ()
    # Distributed Schur K_p statics (parallel/halo_schur.py); () when the
    # dense strategy keeps the replicated path.
    kp_diag_p: Any = ()  # (P, n_lp) regularized-K_p diagonal on owned slots
    agg_own: Any = ()  # (P, n_lp) int32 aggregate of owned verts (two-grid)
    agg_gather: Any = ()  # tuple of (P, n_c+1, w) restriction maps


class HaloNavierStokesSolver(NavierStokesSolver):
    """Distributed (halo-layout) variant of the solver facade.

    Supports both nonlinear strategies: the linearized (Oseen) path via the
    host-side dt-retry ladder and the Newton path via a fully jitted damped
    iteration (:meth:`_halo_newton_step`).  The state's ``x_old``/
    ``x_old_old`` are flat ``(P * n_ld,)`` block-sharded vectors;
    :meth:`global_solution` reassembles the replicated global vector for
    I/O (VTU, checkpoints, validation).
    """

    # Tile decompositions are built PER STRIP in the local numbering
    # (parallel/halo_tiles.py); the base class must not build (and pay
    # for) the global single-chip one.
    _build_single_chip_tiles = False

    def __init__(
        self,
        cfg: SolverConfig,
        mesh,
        n_shards: Optional[int] = None,
        strips=None,
        device_mesh=None,
        n_q1d: int = 3,
    ):
        if cfg.precond_vel_method not in (
            "jacobi", "p1coarse", "p1coarse_mult", "chebyshev", "nodeblock"
        ):
            raise NotImplementedError(
                f"halo layout supports velocity preconditioners jacobi/"
                f"p1coarse/p1coarse_mult/chebyshev/nodeblock, not "
                f"{cfg.precond_vel_method!r}"
            )
        if cfg.precond_schur not in ("cc", "pcd"):
            raise NotImplementedError(
                "halo layout implements the cc/pcd Schur actions, not "
                f"{cfg.precond_schur!r}"
            )
        if cfg.precond_structure not in ("triangular", "diagonal"):
            raise ValueError(
                f"unknown precond structure {cfg.precond_structure!r}"
            )
        if cfg.gmres_dots != "plain":
            raise NotImplementedError(
                "halo layout keeps plain inner products (a chunked reshape "
                "of the block-sharded vector would cross shard boundaries "
                "and force XLA resharding collectives); gmres_dots="
                f"{cfg.gmres_dots!r} is single-chip only"
            )
        if cfg.operator_path == "tile" and cfg.tile_resident:
            raise NotImplementedError(
                "tile_resident Krylov is single-chip-only: its inter-tile "
                "exchange is a same-chip slot gather, while across chips the "
                "halo layout's node-level ppermute exchange already carries "
                "the O(interface) traffic (PARITY.md #8)"
            )
        super().__init__(cfg, mesh, n_q1d=n_q1d)
        if n_shards is None:
            n_shards = len(jax.devices())
        self.device_mesh = (
            device_mesh
            if device_mesh is not None
            else sharding.make_device_mesh(n_shards, axis="shard")
        )
        if strips is None:
            # RCB parts: balanced, spatially compact, any neighbor graph
            # (the multi-round exchange handles it); on channel geometries
            # the recursion reproduces flow-direction strips.  Equivalent
            # of the reference's partition_triangulation (cpp:56-61).
            cent = np.asarray(self.mesh.vertices)[
                np.asarray(self.mesh.elems_p1[: self.mesh.n_el_real])
            ].mean(axis=1)
            real_parts = sharding.rcb_partition(cent, n_shards)
            # Spread globally-padded elements (inert) round-robin to keep
            # per-shard element counts maximally even.
            pads = np.arange(self.mesh.n_el_real, self.fe.n_el)
            strips = [
                np.concatenate([p, pads[i::n_shards]])
                for i, p in enumerate(real_parts)
            ]
        self.hfe = hf.build_halo_fe(self.fe, n_shards, strips=strips)
        # Per-strip tile decompositions (the distributed assembled-operator
        # path) are built from the UNSHARDED HaloFE (host numpy reads).
        self.htiles = None
        if cfg.operator_path == "tile":
            self.htiles = halo_tiles.build_halo_tiles(
                self.mesh, self.hfe, tile_e=cfg.tile_elements,
                cluster=cfg.tile_cluster,
            )
        self.hfe = hf.shard_halo_fe(self.hfe, self.device_mesh)
        if self.htiles is not None:
            self.htiles = halo_tiles.shard_halo_tiles(
                self.htiles, self.device_mesh
            )
            if not cfg.use_supg:
                # Static S1/S2/G/H + phi tables for the fast per-step
                # Oseen build (SUPG cases use the generic block build).
                self.htiles = halo_tiles.build_halo_tile_statics(
                    self.hfe, self.htiles, self.device_mesh
                )
        self._spec = NamedSharding(self.device_mesh, P(self.hfe.axis))

        hfe = self.hfe
        maskf = self.dirichlet.mask.astype(self.dtype)
        mask_loc = hf.scatter_local(hfe, maskf) > 0.5
        pin_glob = jnp.concatenate(
            [
                jnp.zeros((self.fe.n_udofs,), self.dtype),
                self.pressure_ops.pin_mask.astype(self.dtype),
            ]
        )
        pin_loc = hf.scatter_local(hfe, pin_glob) > 0.5
        mp_glob = jnp.concatenate(
            [jnp.ones((self.fe.n_udofs,), self.dtype), self.pressure_ops.mp_lumped]
        )
        mp_loc = hf.scatter_local(hfe, mp_glob)
        mp_loc = jnp.where(jnp.abs(mp_loc) > 1e-30, mp_loc, 1.0)
        off = hfe.dim * hfe.n_ln
        put = lambda a: jax.device_put(a, self._spec)
        ft_stack, pel, pbary, pvalid = self._build_halo_functional_tables()
        vel_mask_glob = (
            self.dirichlet.mask[: self.fe.n_udofs]
            .reshape(self.fe.dim, self.fe.n_vnodes)
            .T
        )
        schur_statics = (
            {}
            if self.pressure_ops.dense
            else {
                k: jax.tree.map(put, v)
                for k, v in halo_schur.build_schur_statics(
                    hfe, self.pressure_ops
                ).items()
            }
        )
        # Chebyshev lmax probe: ones at owned REAL velocity slots only.
        own_real = np.asarray(self.hfe.owned_nodes) < self.hfe.n_vnodes_glob
        probe_np = np.zeros((self.hfe.n_shards, self.hfe.n_ld), self.cfg.np_dtype())
        for d in range(self.hfe.dim):
            probe_np[:, d * self.hfe.n_ln : d * self.hfe.n_ln + self.hfe.n_on_max] = (
                own_real.astype(probe_np.dtype)
            )
        self.statics = HaloStatics(
            mask=put(mask_loc),
            pin_p=put(pin_loc[:, off:]),
            mp_p=put(mp_loc[:, off:]),
            probe_u=put(jnp.asarray(probe_np)),
            vel_mask_glob=jax.device_put(
                vel_mask_glob, NamedSharding(self.device_mesh, P())
            ),
            force=jax.tree.map(put, ft_stack),
            probe_elems=put(pel),
            probe_bary=put(pbary),
            probe_valid=put(pvalid),
            **schur_statics,
        )
        self._attempt_jit = jax.jit(self._halo_attempt)
        self._newton_jit = jax.jit(self._halo_newton_step)
        # Host-driven halo Newton pieces (one jitted call per assembly /
        # solve keeps device programs seconds-long on large meshes — the
        # same rationale as the single-chip host driver).
        self._hn_x0_jit = jax.jit(self._hn_x0)
        self._hn_asm_jit = jax.jit(self._hn_asm)
        self._hn_rhs_jit = jax.jit(self._hn_rhs)
        self._hn_slv_jit = jax.jit(self._hn_slv)
        self._hn_fin_jit = jax.jit(self._hn_fin)

    # ------------------------------------------------------------------
    def initial_state(self) -> State:
        s = super().initial_state()
        x0 = jax.device_put(
            hf.scatter_local(self.hfe, s.x_old).reshape(-1), self._spec
        )
        return dataclasses.replace(s, x_old=x0, x_old_old=jnp.array(x0, copy=True))

    def global_solution(self, state: State):
        """Replicated (n_dofs,) solution vector from the distributed state."""
        return hf.gather_local(self.hfe, state.x_old.reshape(self.hfe.n_shards, -1))

    def to_global_state(self, state: State) -> State:
        """Layout-independent State (global vectors) for checkpointing.

        Checkpoints written from a halo run are loadable by any layout or
        shard count (the on-disk format is the replicated global state).
        """
        P = self.hfe.n_shards
        return dataclasses.replace(
            state,
            x_old=hf.gather_local(self.hfe, state.x_old.reshape(P, -1)),
            x_old_old=hf.gather_local(self.hfe, state.x_old_old.reshape(P, -1)),
        )

    def from_global_state(self, state: State) -> State:
        """Distribute a layout-independent State onto the halo layout."""
        put = lambda xg: jax.device_put(
            hf.scatter_local(self.hfe, jnp.asarray(xg, self.dtype)).reshape(-1),
            self._spec,
        )
        return dataclasses.replace(
            state,
            x_old=put(state.x_old),
            x_old_old=put(state.x_old_old),
        )

    def _build_halo_functional_tables(self):
        """Per-strip force/probe tables in LOCAL element numbering (host).

        Splits the global cylinder face tables by the strip owning each
        face's element and rewrites element ids to strip-local slots; probe
        points are assigned to the one strip owning their element.
        """
        import numpy as np

        from ..ops.functionals import ForceTables

        hfe = self.hfe
        P_ = hfe.n_shards
        gids = np.asarray(hfe.elem_gids)  # (P, n_el_loc)
        n_el_glob = self.fe.n_el
        strip_of = np.full(n_el_glob, -1, np.int64)
        pos_of = np.zeros(n_el_glob, np.int64)
        for s in range(P_):
            m = gids[s] >= 0
            strip_of[gids[s][m]] = s
            pos_of[gids[s][m]] = np.nonzero(m)[0]

        ft = self.force_tables
        elem_g = np.asarray(ft.elem)
        faces = [np.nonzero(strip_of[elem_g] == s)[0] for s in range(P_)]
        nf_max = max((len(f) for f in faces), default=0)
        leaves = {
            k: np.asarray(getattr(ft, k))
            for k in ("normals", "jxw", "p2_values", "p2_phys_grads", "p1_values")
        }
        elem_loc = np.zeros((P_, nf_max), np.int32)
        stacked = {
            k: np.zeros((P_, nf_max) + v.shape[1:], v.dtype) for k, v in leaves.items()
        }
        for s in range(P_):
            f = faces[s]
            elem_loc[s, : len(f)] = pos_of[elem_g[f]]
            for k, v in leaves.items():
                stacked[k][s, : len(f)] = v[f]  # pad faces keep jxw=0 (inert)
        ft_stack = ForceTables(
            elem=jnp.asarray(elem_loc),
            dim=ft.dim,
            **{k: jnp.asarray(v) for k, v in stacked.items()},
        )

        pt = self.probe_tables
        pelem_g = np.asarray(pt.elems)
        pel = np.zeros((P_, 2), np.int32)
        pvalid = np.zeros((P_, 2), np.asarray(leaves["jxw"]).dtype)
        for k in range(2):
            s = int(strip_of[pelem_g[k]])
            pel[s, k] = pos_of[pelem_g[k]]
            pvalid[s, k] = 1.0
        pbary = np.broadcast_to(np.asarray(pt.bary)[None], (P_, 2, pt.bary.shape[1]))
        return ft_stack, jnp.asarray(pel), jnp.asarray(np.ascontiguousarray(pbary)), jnp.asarray(pvalid)

    def _functionals_halo(self, hfe, statics, x_flat):
        """(Cd, Cl, dp) via per-strip partial integrals + one psum each.

        The distributed analog of the reference's MPI-summed surface
        integrals (NavierStokes.cpp:913-1011, 871-912): each strip
        integrates its own cylinder faces on owned+halo fields.
        """
        cfg = self.cfg
        ax = self.hfe.axis

        def body(fe_stack, ft_stack, pel, pbary, pvalid, send_n, send_v, x2):
            fe_loc = jax.tree.map(lambda a: a[0], fe_stack)
            ft_loc = jax.tree.map(lambda a: a[0], ft_stack)
            x = hf.import_halo(hfe, x2[0], send_n[0], send_v[0])
            u, p = hf.local_fields(hfe, x)
            cd_p, cl_p = functionals.lift_drag(
                fe_loc, ft_loc, u, p, nu=self.nu, rho=cfg.rho, U_m=cfg.U_m
            )
            vals_p = (
                jnp.einsum(
                    "kc,kc->k",
                    pbary[0].astype(p.dtype),
                    p[fe_loc.elems_p1[pel[0]]],
                )
                * pvalid[0]
            )
            cd = jax.lax.psum(cd_p, ax)
            cl = jax.lax.psum(cl_p, ax)
            vals = jax.lax.psum(vals_p, ax)
            return cd, cl, vals[0] - vals[1]

        mapped = jax.shard_map(
            body,
            mesh=self.device_mesh,
            in_specs=(P(ax),) * 8,
            out_specs=(P(), P(), P()),
        )
        return mapped(
            hfe.fe_stack, statics.force, statics.probe_elems, statics.probe_bary,
            statics.probe_valid, hfe.send_nodes, hfe.send_verts,
            x_flat.reshape(hfe.n_shards, hfe.n_ld),
        )

    # --- shard_map helpers (all array structures passed explicitly so the
    # jitted attempt never closure-captures device buffers) ---------------
    def _shmap(self, body, n_in, n_scalar=0, n_out=1):
        ax = self.hfe.axis
        specs = (P(ax),) * n_in + (P(),) * n_scalar
        out = P(ax) if n_out == 1 else (P(ax),) * n_out
        return jax.shard_map(body, mesh=self.device_mesh, in_specs=specs, out_specs=out)

    def _assemble_halo(self, hfe, htiles, params, state, t_new, first_order):
        """shard_map pass: RHS, matrix diagonal, advection tables — plus the
        per-strip tile blocks when ``operator_path == "tile"`` (the operator
        is reduced ONCE per trial; every Krylov application is then tile
        matvecs instead of re-deriving the form — parallel/halo_tiles.py)."""
        cfg = self.cfg
        tile = cfg.operator_path == "tile"

        def body(fe_stack, ht_stack, send_n, send_v, x_old2, x_oo2, params,
                 first_order, t_new):
            fe_loc = jax.tree.map(lambda a: a[0], fe_stack)
            sn, sv = send_n[0], send_v[0]
            x_old = hf.import_halo(hfe, x_old2[0], sn, sv)
            x_oo = hf.import_halo(hfe, x_oo2[0], sn, sv)
            u_old, _ = hf.local_fields(hfe, x_old)
            u_oo, _ = hf.local_fields(hfe, x_oo)
            u_star = assembly.extrapolate_advection(u_old, u_oo, first_order)
            f_new = f_old = None
            if cfg.forcing is not None:
                f_new = cfg.forcing(fe_loc.qpoints, t_new)
                f_old = cfg.forcing(fe_loc.qpoints, t_new - params.dt)
            diag_e, b_e = assembly.oseen_rhs_diag(
                fe_loc, params, u_star, u_old, f_new, f_old
            )
            b = hf.export_halo(hfe, fe_loc.accumulate(b_e), sn, sv)
            diag = hf.export_halo(hfe, fe_loc.accumulate(diag_e), sn, sv)
            tables = _pack(matfree.advection_tables(fe_loc, params, u_star))
            blk = ()
            if tile:
                ht_loc = halo_tiles._loc(ht_stack)
                if cfg.use_supg:
                    dvv, cvv, avp, apv, _ = assembly.oseen_blocks(
                        fe_loc, params, u_star, u_old, f_new, f_old
                    )
                    blk = tile_operator.build_tile_blocks(
                        fe_loc, ht_loc.tiles, dvv, cvv, avp, apv
                    )
                else:
                    blk = tile_operator.build_tile_blocks_oseen(
                        fe_loc, ht_loc.tiles, params, u_star
                    )
            return (
                b[None], diag[None],
                jax.tree.map(lambda a: a[None], tables),
                jax.tree.map(lambda a: a[None], blk),
            )

        mapped = self._shmap(body, n_in=6, n_scalar=3, n_out=4)
        Pn = hfe.n_shards
        x_old2 = state.x_old.reshape(Pn, hfe.n_ld)
        x_oo2 = state.x_old_old.reshape(Pn, hfe.n_ld)
        return mapped(
            hfe.fe_stack, htiles, hfe.send_nodes, hfe.send_verts, x_old2,
            x_oo2, params, first_order, t_new,
        )

    def _assemble_newton_halo(self, hfe, htiles, params, x2, x_old2, t_new):
        """shard_map pass: Newton residual RHS, Jacobian diagonal, tables —
        plus the per-strip Jacobian tile blocks on the tile path.

        The quadrature-path kernel (assembly.newton_rhs_diag) runs verbatim
        on each strip's local FEArrays — the (nd, nd) Jacobian element
        matrices are never formed (reference assembles them every Newton
        iteration, NavierStokes.cpp:278-539).  On the tile path the
        physical Jacobian blocks are reduced to tile matrices once per
        Newton iteration, exactly like the single-chip _newton_tile_ctx.
        """
        cfg = self.cfg
        tile = cfg.operator_path == "tile"

        def body(fe_stack, ht_stack, send_n, send_v, x_cur2, x_o2, params, t_new):
            fe_loc = jax.tree.map(lambda a: a[0], fe_stack)
            sn, sv = send_n[0], send_v[0]
            x_cur = hf.import_halo(hfe, x_cur2[0], sn, sv)
            x_old = hf.import_halo(hfe, x_o2[0], sn, sv)
            u_cur, p_cur = hf.local_fields(hfe, x_cur)
            u_old, _ = hf.local_fields(hfe, x_old)
            f_new = f_old = None
            if cfg.forcing is not None:
                f_new = cfg.forcing(fe_loc.qpoints, t_new)
                f_old = cfg.forcing(fe_loc.qpoints, t_new - params.dt)
            blk = ()
            if tile:
                dvv, cvv, avp, apv, b_v, b_p = assembly.newton_blocks(
                    fe_loc, params, u_cur, p_cur, u_old, f_new, f_old
                )
                b_e = assembly.rhs_to_element(fe_loc, b_v, b_p)
                diag_e = assembly.blocks_diag(fe_loc, dvv, cvv)
                blk = tile_operator.build_tile_blocks(
                    fe_loc, halo_tiles._loc(ht_stack).tiles, dvv, cvv, avp, apv
                )
            else:
                diag_e, b_e = assembly.newton_rhs_diag(
                    fe_loc, params, u_cur, p_cur, u_old, f_new, f_old
                )
            b = hf.export_halo(hfe, fe_loc.accumulate(b_e), sn, sv)
            diag = hf.export_halo(hfe, fe_loc.accumulate(diag_e), sn, sv)
            # Roundoff-floor witness: |b_e| accumulated (all-positive sums),
            # same estimate as the single-chip _newton_residual_system.
            babs = hf.export_halo(hfe, fe_loc.accumulate(jnp.abs(b_e)), sn, sv)
            tables = _pack(
                matfree.advection_tables(fe_loc, params, u_cur, newton_reaction=True)
            )
            return (
                b[None], diag[None], babs[None],
                jax.tree.map(lambda a: a[None], tables),
                jax.tree.map(lambda a: a[None], blk),
            )

        mapped = self._shmap(body, n_in=6, n_scalar=2, n_out=5)
        return mapped(
            hfe.fe_stack, htiles, hfe.send_nodes, hfe.send_verts, x2, x_old2,
            params, t_new,
        )

    def _make_matvec(self, hfe, statics, params, tables, newton: bool = False,
                     htiles=None, blocks=()):
        """Row-constrained distributed operator on flat sharded vectors.

        ``newton``: the advection tables carry the linearized-reaction
        gradient (Newton Jacobian, reference: cpp:421-437) instead of the
        Oseen matrix.  On the tile path the operator is the per-strip tile
        matvec on the prebuilt ``blocks`` (Oseen or Jacobian — whatever the
        assembly pass reduced); ``tables`` then only feed the
        preconditioner helpers.
        """
        use_supg = self.cfg.use_supg
        tile = self.cfg.operator_path == "tile"

        def body(fe_stack, ht_stack, blk_stack, tables, send_n, send_v,
                 mask2, x2, params):
            sn, sv = send_n[0], send_v[0]
            x = hf.import_halo(hfe, x2[0], sn, sv)
            if tile:
                y = halo_tiles.tile_apply_local(
                    hfe, halo_tiles._loc(ht_stack), halo_tiles._loc(blk_stack), x
                )
            else:
                fe_loc = jax.tree.map(lambda a: a[0], fe_stack)
                tab = _unpack(
                    jax.tree.map(lambda a: a[0], tables), use_supg, newton
                )
                op = matfree.make_system_operator(fe_loc, params, tables=tab)
                y = op(x)
            y = hf.export_halo(hfe, y, sn, sv)
            return jnp.where(mask2[0], x2[0], y)[None]

        mapped = self._shmap(body, n_in=8, n_scalar=1)

        def apply_a(x_flat):
            x2 = x_flat.reshape(hfe.n_shards, hfe.n_ld)
            y = mapped(
                hfe.fe_stack, htiles, blocks, tables, hfe.send_nodes,
                hfe.send_verts, statics.mask, x2, params,
            )
            return y.reshape(-1)

        return apply_a

    def _make_div_apply(self, hfe, params, htiles=None, blocks=()):
        """B z_u (pressure rows only): one pressure-sized halo export.

        The demo preconditioner in parallel/halo.py spent a FULL matvec on
        step 2 of Cahouet-Chabard; the divergence block alone is ~1/6 of
        the work and a dim-times-smaller export message.  On the tile path
        the pressure rows come from the H tile blocks (identical rows to
        the single-chip tile operator's ``.divergence``).
        """
        tile = self.cfg.operator_path == "tile"

        def body(fe_stack, ht_stack, blk_stack, send_n, send_v, z2, params):
            sv = send_v[0]
            z = hf.import_halo(hfe, z2[0], send_n[0], sv)
            if tile:
                yp = halo_tiles.tile_divergence_local(
                    hfe, halo_tiles._loc(ht_stack), halo_tiles._loc(blk_stack), z
                )
            else:
                fe_loc = jax.tree.map(lambda a: a[0], fe_stack)
                u = z[: hfe.dim * hfe.n_ln].reshape(hfe.dim, hfe.n_ln).T
                u_e = u[fe_loc.elems_p2]
                du_ref = jnp.einsum("qak,ead->eqkd", fe_loc.p2_refg, u_e)
                gu = jnp.einsum("eqkd,ekm->eqdm", du_ref, fe_loc.jinv)
                divu = jnp.einsum("eqdd->eq", gu)
                yp_e = -jnp.einsum(
                    "eq,eq,qc->ec", fe_loc.jxw, divu, fe_loc.p1_val
                )
                yp = fe_loc.accumulate_p(yp_e)
            # Export pressure halo partials to their owners (compress(add)).
            return hf.export_halo_p(hfe, yp, sv)[None]

        mapped = self._shmap(body, n_in=6, n_scalar=1)

        def div_apply(z2):
            # z2: (P, n_ld) with pressure rows zero; returns (P, n_lp).
            return mapped(
                hfe.fe_stack, htiles, blocks, hfe.send_nodes, hfe.send_verts,
                z2, params,
            )

        return div_apply

    def _make_vel_apply(self, hfe, statics, params, tables,
                        newton: bool = False, htiles=None, blocks=()):
        """Velocity-block-only distributed apply (Chebyshev smoothing).

        Mirrors the single-chip wrapper in models/solver.py::_solve_linear
        exactly: zero constrained input columns, apply only the velocity
        rows of the operator, identity on constrained rows — so the halo
        Chebyshev polynomial smooths the identical matrix and the Krylov
        iteration counts coincide across layouts.
        """
        use_supg = self.cfg.use_supg
        tile = self.cfg.operator_path == "tile"
        off = hfe.dim * hfe.n_ln

        def body(fe_stack, ht_stack, blk_stack, tables, send_n, send_v,
                 mask2, z2, params):
            sn, sv = send_n[0], send_v[0]
            zf = jnp.where(mask2[0], 0.0, z2[0]).at[off:].set(0.0)
            x = hf.import_halo(hfe, zf, sn, sv)
            if tile:
                y = halo_tiles.tile_velocity_local(
                    hfe, halo_tiles._loc(ht_stack), halo_tiles._loc(blk_stack), x
                )
            else:
                fe_loc = jax.tree.map(lambda a: a[0], fe_stack)
                tab = _unpack(
                    jax.tree.map(lambda a: a[0], tables), use_supg, newton
                )
                op = matfree.make_system_operator(fe_loc, params, tables=tab)
                y = op.velocity_block(x)
            y = hf.export_halo(hfe, y, sn, sv)
            y = y.at[off:].set(0.0)
            return jnp.where(mask2[0], z2[0], y)[None]

        mapped = self._shmap(body, n_in=8, n_scalar=1)

        def vel_apply(z_flat):
            z2 = z_flat.reshape(hfe.n_shards, hfe.n_ld)
            y = mapped(
                hfe.fe_stack, htiles, blocks, tables, hfe.send_nodes,
                hfe.send_verts, statics.mask, z2, params,
            )
            return y.reshape(-1)

        return vel_apply

    def _make_fp_apply(self, hfe, params, tables):
        """w = F_p y (PCD reaction operator) on (P, n_lp) owned vectors.

        F_p = (rho/dt) M_p + theta (nu K_p + N_p(u_adv)) with the advection
        field taken from this step's quadrature tables (u* for Oseen, u_k
        for Newton) — the distributed mirror of the nodal PCD branch in
        solvers/preconditioners.py::make_schur_action.  Strip-local element
        integrals + one pressure-sized halo export; no replicated gather.
        """
        use_supg = self.cfg.use_supg
        newton_tables = len(tables) >= (4 if use_supg else 3)

        def body(fe_stack, tables, send_v, y2, params):
            fe_loc = jax.tree.map(lambda a: a[0], fe_stack)
            tab = _unpack(
                jax.tree.map(lambda a: a[0], tables), use_supg, newton_tables
            )
            uadv_q = tab[0]  # (n_el_loc, q, dim) advection at quad points
            sv = send_v[0]
            y = hf.import_halo_p(hfe, y2[0], sv)
            y_e = y[fe_loc.elems_p1]
            AF_e = (params.rho / params.dt) * fe_loc.mp_e + (
                params.theta * params.nu
            ) * fe_loc.kp_e
            w_e = jnp.einsum("ecf,ef->ec", AF_e, y_e)
            g1p = fe_loc.phys_grads_p1()
            gy = jnp.einsum("ec,ecd->ed", y_e, g1p)
            adv = jnp.einsum("eqd,ed->eq", uadv_q, gy)
            w_e = w_e + params.theta * jnp.einsum(
                "eq,qc,eq->ec", fe_loc.jxw, fe_loc.p1_val, adv
            )
            return hf.export_halo_p(hfe, fe_loc.accumulate_p(w_e), sv)[None]

        mapped = self._shmap(body, n_in=4, n_scalar=1)

        def fp_apply(y2):
            return mapped(hfe.fe_stack, tables, hfe.send_verts, y2, params)

        return fp_apply

    def _halo_nodeblock_inv(
        self, hfe, statics, params, x2, x_oo2=None, first_order=None,
        newton: bool = False,
    ):
        """Per-node dim x dim velocity block inverses on the halo layout.

        Assembles assembly.oseen_nodeblock_diag on each strip's advection
        field (u* extrapolated for Oseen, u_k for Newton — same kernel as
        the single-chip _nodeblock_inv), exports the dim block columns as
        velocity fields, and inverts the fully-summed owned blocks.
        Dirichlet rows/columns and inert pad/halo slots become identity
        blocks, matching the single-chip masking.
        """
        dim, off = hfe.dim, hfe.dim * hfe.n_ln

        def body(fe_stack, send_n, send_v, xa2, xb2, params, first_order):
            fe_loc = jax.tree.map(lambda a: a[0], fe_stack)
            sn, sv = send_n[0], send_v[0]
            x_a = hf.import_halo(hfe, xa2[0], sn, sv)
            u_a, _ = hf.local_fields(hfe, x_a)
            if newton:
                u_adv = u_a
            else:
                x_b = hf.import_halo(hfe, xb2[0], sn, sv)
                u_b, _ = hf.local_fields(hfe, x_b)
                u_adv = assembly.extrapolate_advection(u_a, u_b, first_order)
            Bn = assembly.oseen_nodeblock_diag(fe_loc, params, u_adv)
            Bacc = fe_loc.accumulate_nodes(
                Bn.reshape(fe_loc.n_el, fe_loc.n2, dim * dim)
            ).reshape(hfe.n_ln, dim, dim)
            cols = []
            for f in range(dim):
                vec = jnp.concatenate(
                    [
                        Bacc[:, :, f].T.reshape(-1),
                        jnp.zeros((hfe.n_lp,), Bacc.dtype),
                    ]
                )
                cols.append(hf.export_halo(hfe, vec, sn, sv))
            return jnp.stack(cols)[None]  # (1, dim_f, n_ld)

        mapped = self._shmap(body, n_in=5, n_scalar=2)
        x_oo2 = x2 if x_oo2 is None else x_oo2
        first_order = (
            jnp.asarray(True) if first_order is None else first_order
        )
        nb = mapped(
            hfe.fe_stack, hfe.send_nodes, hfe.send_verts, x2, x_oo2,
            params, first_order,
        )  # (P, dim_f, n_ld)
        Pn = hfe.n_shards
        vel = nb[:, :, :off].reshape(Pn, dim, dim, hfe.n_ln)  # [p, f, d, n]
        B = vel.transpose(0, 3, 2, 1)  # [p, n, d, f]
        mu = (
            statics.mask[:, :off]
            .reshape(Pn, dim, hfe.n_ln)
            .transpose(0, 2, 1)
        )  # [p, n, d]
        either = mu[..., :, None] | mu[..., None, :]
        eye = jnp.eye(dim, dtype=B.dtype)
        B = jnp.where(either, eye, B)
        # Pads / halo slots accumulate nothing -> zero diagonal -> identity.
        inert = (jnp.abs(B[..., 0, 0]) < 1e-30)[..., None, None]
        B = jnp.where(inert, eye, B)
        return assembly.invert_spd_blocks(B)  # (P, n_ln, dim, dim)

    def _make_kp_dist(self, hfe, statics, pops):
        """Shard_mapped distributed K_p solve on (P, n_lp) owned residuals.

        Strip-local two-grid / CG with O(interface) pressure exchanges and
        an O(n_c) psum for the coarse residual (parallel/halo_schur.py) —
        replaces the O(n_p) replicated gather per preconditioner
        application.
        """
        cfg = self.cfg
        ax = hfe.axis

        def body(fe_stack, send_v, pin, diagp, agg_own, agg_g, t2, kc_inv):
            fe_loc = jax.tree.map(lambda a: a[0], fe_stack)
            solve = halo_schur.make_kp_solve_local(
                hfe, fe_loc,
                pin[0], diagp[0],
                jax.tree.map(lambda a: a[0], agg_own),
                jax.tree.map(lambda a: a[0], agg_g),
                send_v[0], kc_inv,
                eps=pops.eps, two_level=pops.two_level,
                kp_iters=cfg.precond_kp_iters,
                cycles=cfg.precond_twolevel_cycles,
            )
            return solve(t2[0])[None]

        mapped = jax.shard_map(
            body,
            mesh=self.device_mesh,
            in_specs=(P(ax),) * 7 + (P(),),
            out_specs=P(ax),
        )

        def kp_dist(t_free):
            # t_free: (P, n_lp) pressure residual, zero at pins and halo
            # slots (owned-valued); result is owned-valued too.
            return mapped(
                hfe.fe_stack, hfe.send_verts, statics.pin_p, statics.kp_diag_p,
                statics.agg_own, statics.agg_gather, t_free, pops.kc_inv,
            )

        return kp_dist

    def _make_halo_precond(self, hfe, statics, pops, fe, params, diag2,
                           div_apply, apply_a=None, tables=None, nbinv=None,
                           newton=False, htiles=None, blocks=()):
        """Block preconditioner on the owned layout.

        Velocity step: owned-local Jacobi (default), the P1-coarse
        correction with a REPLICATED coarse solve (``p1coarse*`` — the
        coarse residual is vertex-sized, gathered to the global space
        exactly like the Schur's pressure residual below; the
        multiplicative variant post-smooths with one distributed matvec —
        ``apply_a``: the trial pressure is zero so its velocity rows are
        exactly A_vv z_c), a distributed Chebyshev polynomial
        (``chebyshev`` — lmax re-estimated per build by a power iteration
        of distributed velocity-block applies), or per-node dim x dim
        block inverses (``nodeblock`` — assembled and exported once per
        build, ``nbinv``).

        Schur step: Cahouet-Chabard (default) or PCD (``precond_schur=
        "pcd"`` — the F_p reaction applied strip-local via
        :meth:`_make_fp_apply`, advection from this step's ``tables``).

        ``precond_structure="diagonal"`` skips the divergence coupling
        (t = r_p instead of r_p - B z_u), the halo mirror of the nodal
        block-diagonal option (reference: NavierStokes.hpp:242-277).
        """
        cfg = self.cfg
        off = hfe.dim * hfe.n_ln
        if pops.dense:
            # Small pressure spaces: the exact dense inverse stays
            # replicated (gather + one MXU matmul; sharding an O(n_p^2)
            # matmul at these sizes would add a collective to save nothing).
            kp_solve = preconditioners.make_kp_solve(
                fe, pops, kp_iters=cfg.precond_kp_iters,
                twolevel_cycles=cfg.precond_twolevel_cycles,
            )
        else:
            # Two-grid / CG strategies run fully distributed: strip-local
            # K_p applications + O(interface) pressure exchanges + one
            # O(n_c) psum per V-cycle (parallel/halo_schur.py).
            kp_dist = self._make_kp_dist(hfe, statics, pops)
        npg = hfe.n_p_glob
        dt, theta, nu, rho = params.dt, params.theta, params.nu, params.rho
        # Schur M_p coefficient: nu + gamma under config.schur_gd_mass
        # (grad-div-aware Cahouet-Chabard; see solvers/preconditioners.py).
        nu_m = nu + cfg.grad_div_gamma if cfg.schur_gd_mass_on() else nu
        p1c = cfg.precond_vel_method.startswith("p1coarse")
        mult = cfg.precond_vel_method == "p1coarse_mult" and apply_a is not None
        if p1c:
            coarse_solve = preconditioners.make_p1_coarse_solve(
                fe, pops, rho / dt, theta * nu, iters=cfg.precond_p1_iters,
                gamma=cfg.grad_div_gamma if cfg.use_supg else None,
            )
            vmask_glob = statics.vel_mask_glob
        cheby = cfg.precond_vel_method == "chebyshev"
        if cheby:
            vel_apply = self._make_vel_apply(
                hfe, statics, params, tables, newton=newton,
                htiles=htiles, blocks=blocks,
            )
            diag_flat = diag2.reshape(-1)
            lmax = chebyshev.estimate_lmax(
                vel_apply, diag_flat, statics.probe_u.reshape(-1), iters=8
            )
        fp_apply = (
            self._make_fp_apply(hfe, params, tables)
            if cfg.precond_schur == "pcd"
            else None
        )

        def precond(r_flat):
            r = r_flat.reshape(hfe.n_shards, hfe.n_ld)
            r_u = r.at[:, off:].set(0.0)
            # step 1: velocity solve (owned-local; reference ILU(1),
            # NavierStokes.hpp:301-304).
            if cheby:
                z_u = chebyshev.chebyshev(
                    vel_apply, r_u.reshape(-1), diag_flat, lmax,
                    degree=cfg.precond_vel_degree,
                ).reshape(r.shape)
                z_u = jnp.where(statics.mask, 0.0, z_u).at[:, off:].set(0.0)
            elif cfg.precond_vel_method == "nodeblock":
                r_u2 = r[:, :off].reshape(hfe.n_shards, hfe.dim, hfe.n_ln)
                z2 = jnp.einsum("pndf,pfn->pdn", nbinv, r_u2)
                z_u = jnp.zeros_like(r).at[:, :off].set(
                    z2.reshape(hfe.n_shards, off)
                )
                z_u = jnp.where(statics.mask, 0.0, z_u)
            else:
                z_u = jnp.where(statics.mask, 0.0, r_u / diag2)
                z_u = z_u.at[:, off:].set(0.0)
            if p1c:
                # P1-coarse correction (replicated, like the Schur).
                r2 = jnp.where(vmask_glob, 0.0, hf.gather_vel(hfe, r))
                z1 = coarse_solve(preconditioners.p1_restrict(pops, r2))
                zc2 = jnp.where(
                    vmask_glob, 0.0, preconditioners.p1_prolong(pops, z1)
                )
                zc = jnp.zeros_like(r).at[:, :off].set(hf.owned_vel(hfe, zc2))
                if mult:
                    resid = r_u - apply_a(zc.reshape(-1)).reshape(r.shape)
                    resid = resid.at[:, off:].set(0.0)
                    z_u = (zc + resid / diag2).at[:, off:].set(0.0)
                    z_u = jnp.where(statics.mask, 0.0, z_u)
                else:
                    z_u = z_u + zc
            # step 2: t = r_p - B z_u — divergence-only distributed apply
            # (skipped by the block-diagonal structure: t = r_p).
            if cfg.precond_structure == "diagonal":
                t = r[:, off:]
            else:
                t = r[:, off:] - div_apply(z_u)
            t_free = jnp.where(statics.pin_p, 0.0, t)
            # step 3: Schur action.
            if pops.dense:
                # Dense strategy: replicated (gather the owned pressure
                # residual to the global space and back).
                t_glob = (
                    jnp.zeros((npg + 1,), t_free.dtype)
                    .at[hfe.owned_verts.reshape(-1)]
                    .set(t_free[:, : hfe.n_op_max].reshape(-1))[:-1]
                )
                kp_inv_t = kp_solve(t_glob)
                kp_pad = jnp.concatenate(
                    [kp_inv_t, jnp.zeros((1,), kp_inv_t.dtype)]
                )
                kinv_own = kp_pad[hfe.owned_verts]  # (P, n_op_max)
                kinv_loc = jnp.concatenate(
                    [
                        kinv_own,
                        jnp.zeros((hfe.n_shards, hfe.n_hp_max), kinv_own.dtype),
                    ],
                    axis=1,
                )
            else:
                kinv_loc = kp_dist(t_free)  # (P, n_lp) owned-valued
            if fp_apply is not None:
                # PCD: S^{-1} ~ -M_p^{-1} F_p K_p^{-1} (Elman-Silvester-
                # Wathen) — identical mathematics to the nodal branch in
                # preconditioners.make_schur_action, distributed.
                y = jnp.where(statics.pin_p, 0.0, kinv_loc)
                w = fp_apply(y)
                z_p = -jnp.where(statics.pin_p, 0.0, w) / statics.mp_p
            else:
                z_p = -(rho / dt) * kinv_loc - (theta * nu_m) * (
                    t_free / statics.mp_p
                )
            z_p = jnp.where(statics.pin_p, t, z_p)
            z = z_u.at[:, off:].set(z_p)
            z = jnp.where(statics.mask, r, z)
            return z.reshape(-1)

        return precond

    # --- one ladder trial on the halo layout ----------------------------
    def _halo_attempt(self, state: State, k, hfe, pops, statics, fe,
                      htiles=None):
        """Jitted attempt (k traced).  ``hfe``/``pops``/``statics``/``fe``/
        ``htiles`` are jit ARGUMENTS so their (potentially GB-scale) leaves
        stay device-resident buffers instead of being lowered as program
        constants (``fe`` is the GLOBAL element arrays consumed by the
        replicated coarse solves in the preconditioner)."""
        cfg = self.cfg
        t_new = state.time + jnp.asarray(self.dt0, self.dtype)
        theta0 = jnp.asarray(cfg.theta, self.dtype)
        theta_eff = jnp.where(
            state.first_step & (cfg.time_scheme == TimeScheme.CRANK_NICOLSON),
            jnp.asarray(1.0, self.dtype),
            theta0,
        )
        is_be = cfg.time_scheme == TimeScheme.BACKWARD_EULER
        dt_att, force_be = self._trial_params(k)
        th = jnp.where(force_be, jnp.asarray(1.0, self.dtype), theta_eff)
        first_order = state.first_step | state.second_step | force_be | is_be
        params = assembly.StepParams(
            dt=dt_att, theta=th, nu=jnp.asarray(self.nu, self.dtype),
            rho=cfg.rho, gamma=cfg.grad_div_gamma, use_supg=cfg.use_supg,
        )

        b2, diag2, tables, blocks = self._assemble_halo(
            hfe, htiles, params, state, t_new, first_order
        )
        mask2 = statics.mask
        diag2 = jnp.where(mask2, 1.0, diag2)
        diag2 = jnp.where(jnp.abs(diag2) > 1e-30, diag2, 1.0)

        g_glob = self.dirichlet.values(cfg.inlet_profile, t_new)
        g2 = hf.scatter_local(hfe, g_glob.astype(self.dtype))
        b_hat = jnp.where(mask2, g2, b2)
        x_start = (
            state.x_old.reshape(hfe.n_shards, hfe.n_ld)
            if cfg.gmres_warm_start
            else jnp.zeros_like(b_hat)
        )
        x0 = jnp.where(mask2, g2, x_start)

        apply_a = self._make_matvec(
            hfe, statics, params, tables, htiles=htiles, blocks=blocks
        )
        div_apply = self._make_div_apply(hfe, params, htiles=htiles, blocks=blocks)
        nbinv = (
            self._halo_nodeblock_inv(
                hfe, statics, params,
                state.x_old.reshape(hfe.n_shards, hfe.n_ld),
                state.x_old_old.reshape(hfe.n_shards, hfe.n_ld),
                first_order,
            )
            if cfg.precond_vel_method == "nodeblock"
            else None
        )
        precond = self._make_halo_precond(
            hfe, statics, pops, fe, params, diag2, div_apply, apply_a=apply_a,
            tables=tables, nbinv=nbinv, htiles=htiles, blocks=blocks,
        )
        res = gmres.fgmres(
            apply_a, b_hat.reshape(-1), precond=precond, x0=x0.reshape(-1),
            restart=cfg.gmres_restart, maxiter=cfg.gmres_maxiter_linear,
            rtol=cfg.gmres_rtol, alloc=cfg.gmres_alloc,
            # Owned-block layout: each global dof lives in exactly one
            # owned slot and padding is zero, so the plain norms inside
            # fgmres (psum-reduced under SPMD) are the global norms — the
            # defect criterion distributes for free (one extra matvec).
            criterion=self._gmres_criterion,  # "auto" resolved at init
        )

        return self._halo_finalize(
            state, t_new, hfe, statics, res.x, res.converged, res.iterations,
            dt_att, jnp.asarray(0, jnp.int32), res.residual,
        )

    def _halo_finalize(
        self, state, t_new, hfe, statics, x_flat, ok, gmres_its, dt_used,
        newton_its, resid
    ):
        """Functionals + history shift on the distributed state.

        Functionals run fully distributed: per-strip partial surface
        integrals on the local force tables + one psum (no global gather —
        the step is O(local) end to end).
        """
        cd, cl, dp = self._functionals_halo(hfe, statics, x_flat)

        new_state = State(
            x_old=x_flat,
            x_old_old=state.x_old,
            time=t_new,
            step=state.step + 1,
            first_step=jnp.asarray(False),
            second_step=state.first_step,
        )
        metrics = StepMetrics(
            time=t_new, drag=cd, lift=cl, delta_p=dp,
            gmres_iters=gmres_its, newton_iters=newton_its,
            converged=ok, residual=resid, dt_used=dt_used,
        )
        return new_state, metrics

    # --- Newton path on the halo layout ---------------------------------
    def _halo_newton_step(self, state: State, hfe, pops, statics, fe,
                          htiles=None):
        """Jitted Newton time step on the distributed owned-node layout.

        Mirrors ``NavierStokesSolver._newton_advance`` (reference:
        NavierStokes.cpp:1116-1207 — adaptive damping in [0.05, 1] with the
        0.99-stall-halve / 0.5-grow rules and post-linear-failure
        backtracking) with every vector block-sharded: residual assembly and
        the Jacobian matvec are shard_mapped with ghost import/export, the
        Newton algebra (norms, axpys) runs on flat sharded vectors with
        XLA-inserted psums.
        """
        cfg = self.cfg
        dt0 = jnp.asarray(self.dt0, self.dtype)
        t_new = state.time + dt0
        theta_eff = jnp.where(
            state.first_step & (cfg.time_scheme == TimeScheme.CRANK_NICOLSON),
            jnp.asarray(1.0, self.dtype),
            jnp.asarray(cfg.theta, self.dtype),
        )
        params = assembly.StepParams(
            dt=dt0, theta=theta_eff, nu=jnp.asarray(self.nu, self.dtype),
            rho=cfg.rho, gamma=cfg.grad_div_gamma, use_supg=cfg.use_supg,
        )
        mask2 = statics.mask
        Pn = hfe.n_shards
        g_glob = self.dirichlet.values(cfg.inlet_profile, t_new)
        g2 = hf.scatter_local(hfe, g_glob.astype(self.dtype))
        x_old2 = state.x_old.reshape(Pn, hfe.n_ld)

        def residual_system(x2):
            b2, diag2, babs2, tables, blocks = self._assemble_newton_halo(
                hfe, htiles, params, x2, x_old2, t_new
            )
            b_hat = jnp.where(mask2, 0.0, b2)
            diag2 = jnp.where(mask2, 1.0, diag2)
            diag2 = jnp.where(jnp.abs(diag2) > 1e-30, diag2, 1.0)
            eps = jnp.finfo(b2.dtype).eps
            floor = eps * jnp.linalg.norm(jnp.where(mask2, 0.0, babs2))
            return b_hat, diag2, floor, tables, blocks

        # Lift the non-homogeneous BCs onto the iterate (cpp:1118-1142).
        x0 = jnp.where(mask2, g2, x_old2)

        big = jnp.asarray(1e10, self.dtype)
        tol = cfg.newton_tolerance
        ew = cfg.newton_forcing == "ew"

        def cond(c):
            x, res, prev, res0, stall, damping, eta, it, tg, done, ok = c
            return (~done) & (it < cfg.newton_max_iterations)

        def body(c):
            x, res_in, prev, res0, stall, damping, eta_prev, it, tg, _, _ = c
            b_hat, diag2, floor, tables, blocks = residual_system(x)
            res = jnp.linalg.norm(b_hat)
            res0 = jnp.where(it == 0, res, res0)
            # Same honest stall exit as the single-chip Newton loop: a
            # 3-iteration stall stops the iteration but only reports
            # converged when the residual sits at the roundoff floor.
            stall = jnp.where(res > 0.9 * prev, stall + 1, 0)
            tol_hit = (res < tol) | (res < cfg.newton_rtol * res0)
            done = tol_hit | (stall >= 3)
            ok = tol_hit | (
                (stall >= 3) & (res <= cfg.newton_stall_floor_factor * floor)
            )
            eta = (
                self._ew_eta(res, prev, eta_prev, it, res0)
                if ew
                else eta_prev
            )

            def do_update(_):
                d1 = jnp.where(
                    (it > 0) & (res > 0.99 * prev),
                    jnp.maximum(0.05, damping * 0.5),
                    damping,
                )
                d1 = jnp.where(
                    (res < 0.5 * prev) & (d1 < 1.0 - 1e-12),
                    jnp.minimum(1.0, d1 * 1.5),
                    d1,
                )
                apply_a = self._make_matvec(
                    hfe, statics, params, tables, newton=True,
                    htiles=htiles, blocks=blocks,
                )
                div_apply = self._make_div_apply(
                    hfe, params, htiles=htiles, blocks=blocks
                )
                nbinv = (
                    self._halo_nodeblock_inv(
                        hfe, statics, params, x, newton=True
                    )
                    if cfg.precond_vel_method == "nodeblock"
                    else None
                )
                precond = self._make_halo_precond(
                    hfe, statics, pops, fe, params, diag2, div_apply,
                    apply_a=apply_a, tables=tables, nbinv=nbinv, newton=True,
                    htiles=htiles, blocks=blocks,
                )
                sol = gmres.fgmres(
                    apply_a, b_hat.reshape(-1), precond=precond,
                    x0=jnp.zeros((Pn * hfe.n_ld,), self.dtype),
                    restart=cfg.gmres_restart, maxiter=cfg.gmres_maxiter_newton,
                    rtol=eta if ew else cfg.gmres_rtol_newton,
                    alloc=cfg.gmres_alloc,
                )
                lin_ok = sol.converged
                d2 = jnp.where(lin_ok, d1, jnp.maximum(0.05, d1 * 0.25))
                upd = sol.x.reshape(Pn, hfe.n_ld)
                x_new = x + d2 * upd

                def backtrack(_):
                    b2, _, _, _, _ = residual_system(x_new)
                    new_res = jnp.linalg.norm(b2)
                    bad = new_res > 2.0 * res
                    d3 = jnp.where(bad, jnp.maximum(0.01, d2 * 0.5), d2)
                    x_bt = jnp.where(bad, x + d3 * upd, x_new)
                    return x_bt, d3

                x_out, d_out = jax.lax.cond(
                    ~lin_ok, backtrack, lambda _: (x_new, d2), None
                )
                return x_out, d_out, sol.iterations

            def no_update(_):
                return x, damping, jnp.asarray(0, jnp.int32)

            x_out, d_out, g_its = jax.lax.cond(~done, do_update, no_update, None)
            return (
                x_out, res, res, res0, stall, d_out, eta,
                it + jnp.where(done, 0, 1), tg + g_its, done, ok,
            )

        init = (
            x0, big, big, big, jnp.asarray(0, jnp.int32),
            jnp.asarray(1.0, self.dtype),
            jnp.asarray(cfg.newton_forcing_eta_max, self.dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32), jnp.asarray(False), jnp.asarray(False),
        )
        x, res, _, _, _, _, _, iters, total_gmres, _, ok = jax.lax.while_loop(
            cond, body, init
        )
        return self._halo_finalize(
            state, t_new, hfe, statics, x.reshape(-1), ok, total_gmres, dt0,
            iters, res,
        )

    # --- host-driven halo Newton (bounded device-call length) -----------
    def _hn_params(self, theta):
        cfg = self.cfg
        return assembly.StepParams(
            dt=jnp.asarray(self.dt0, self.dtype), theta=theta,
            nu=jnp.asarray(self.nu, self.dtype), rho=cfg.rho,
            gamma=cfg.grad_div_gamma, use_supg=cfg.use_supg,
        )

    def _hn_x0(self, state, t_new, hfe, statics):
        """Dirichlet-lifted initial iterate + x_old blocks (cpp:1118-1142)."""
        g_glob = self.dirichlet.values(self.cfg.inlet_profile, t_new)
        g2 = hf.scatter_local(hfe, g_glob.astype(self.dtype))
        x_old2 = state.x_old.reshape(hfe.n_shards, hfe.n_ld)
        return jnp.where(statics.mask, g2, x_old2), x_old2

    def _hn_asm(self, x2, x_old2, t_new, theta, hfe, pops, statics, fe,
                htiles=None):
        params = self._hn_params(theta)
        b2, diag2, babs2, tables, blocks = self._assemble_newton_halo(
            hfe, htiles, params, x2, x_old2, t_new
        )
        mask2 = statics.mask
        b_hat = jnp.where(mask2, 0.0, b2)
        diag2 = jnp.where(mask2, 1.0, diag2)
        diag2 = jnp.where(jnp.abs(diag2) > 1e-30, diag2, 1.0)
        eps = jnp.finfo(b2.dtype).eps
        floor = eps * jnp.linalg.norm(jnp.where(mask2, 0.0, babs2))
        return b_hat, diag2, floor, jnp.linalg.norm(b_hat), tables, blocks

    def _hn_rhs(self, x2, x_old2, t_new, theta, hfe, statics, fe):
        """Residual-only shard_map pass for Jacobian-reuse iterations.

        The (frozen) operator/preconditioner inputs are NOT rebuilt; the
        outer stopping test still sees the TRUE residual at the current
        iterate (modified Newton) — the halo mirror of the single-chip
        ``_newton_rhs_step``.
        """
        cfg = self.cfg
        params = self._hn_params(theta)

        def body(fe_stack, send_n, send_v, x_cur2, x_o2, params, t_new):
            fe_loc = jax.tree.map(lambda a: a[0], fe_stack)
            sn, sv = send_n[0], send_v[0]
            x_cur = hf.import_halo(hfe, x_cur2[0], sn, sv)
            x_old = hf.import_halo(hfe, x_o2[0], sn, sv)
            u_cur, p_cur = hf.local_fields(hfe, x_cur)
            u_old, _ = hf.local_fields(hfe, x_old)
            f_new = f_old = None
            if cfg.forcing is not None:
                f_new = cfg.forcing(fe_loc.qpoints, t_new)
                f_old = cfg.forcing(fe_loc.qpoints, t_new - params.dt)
            _, b_e = assembly.newton_rhs_diag(
                fe_loc, params, u_cur, p_cur, u_old, f_new, f_old
            )
            b = hf.export_halo(hfe, fe_loc.accumulate(b_e), sn, sv)
            babs = hf.export_halo(hfe, fe_loc.accumulate(jnp.abs(b_e)), sn, sv)
            return b[None], babs[None]

        mapped = self._shmap(body, n_in=5, n_scalar=2, n_out=2)
        b2, babs2 = mapped(
            hfe.fe_stack, hfe.send_nodes, hfe.send_verts, x2, x_old2,
            params, t_new,
        )
        mask2 = statics.mask
        b_hat = jnp.where(mask2, 0.0, b2)
        eps = jnp.finfo(b2.dtype).eps
        floor = eps * jnp.linalg.norm(jnp.where(mask2, 0.0, babs2))
        return b_hat, jnp.linalg.norm(b_hat), floor

    def _hn_slv(self, x2, x_old2, b_hat, diag2, tables, blocks, d1, rtol,
                t_new, theta, hfe, pops, statics, fe, htiles=None):
        cfg = self.cfg
        params = self._hn_params(theta)
        Pn = hfe.n_shards
        apply_a = self._make_matvec(
            hfe, statics, params, tables, newton=True,
            htiles=htiles, blocks=blocks,
        )
        div_apply = self._make_div_apply(hfe, params, htiles=htiles, blocks=blocks)
        nbinv = (
            self._halo_nodeblock_inv(hfe, statics, params, x2, newton=True)
            if cfg.precond_vel_method == "nodeblock"
            else None
        )
        precond = self._make_halo_precond(
            hfe, statics, pops, fe, params, diag2, div_apply, apply_a=apply_a,
            tables=tables, nbinv=nbinv, newton=True, htiles=htiles,
            blocks=blocks,
        )
        sol = gmres.fgmres(
            apply_a, b_hat.reshape(-1), precond=precond,
            x0=jnp.zeros((Pn * hfe.n_ld,), self.dtype),
            restart=cfg.gmres_restart, maxiter=cfg.gmres_maxiter_newton,
            rtol=rtol, alloc=cfg.gmres_alloc,
        )
        lin_ok = sol.converged
        d2 = jnp.where(lin_ok, d1, jnp.maximum(0.05, d1 * 0.25))
        upd = sol.x.reshape(Pn, hfe.n_ld)
        x_new = x2 + d2 * upd
        res = jnp.linalg.norm(b_hat)

        def backtrack(_):
            b2, _, _, _, _ = self._assemble_newton_halo(
                hfe, htiles, params, x_new, x_old2, t_new
            )
            new_res = jnp.linalg.norm(jnp.where(statics.mask, 0.0, b2))
            bad = new_res > 2.0 * res
            d3 = jnp.where(bad, jnp.maximum(0.01, d2 * 0.5), d2)
            return jnp.where(bad, x2 + d3 * upd, x_new), d3

        x_out, d_out = jax.lax.cond(
            ~lin_ok, backtrack, lambda _: (x_new, d2), None
        )
        return x_out, d_out, sol.iterations

    def _hn_fin(self, state, t_new, x_flat, ok, tg, nits, res, hfe, statics):
        return self._halo_finalize(
            state, t_new, hfe, statics, x_flat, ok, tg,
            jnp.asarray(self.dt0, self.dtype), nits, res,
        )

    def _halo_newton_host_step(self, state: State):
        """Host-driven damped Newton on the halo layout.

        Same control flow (damping, honest stall exit) as the single-chip
        ``_newton_host_step``; one jitted device call per assembly and per
        linear solve bounds every device program.
        """
        cfg = self.cfg
        hfe, pops, statics, fe = self.hfe, self.pressure_ops, self.statics, self.fe
        first = bool(state.first_step)  # one pull
        theta_eff = (
            1.0
            if (first and cfg.time_scheme == TimeScheme.CRANK_NICOLSON)
            else cfg.theta
        )
        th = jnp.asarray(theta_eff, self.dtype)
        t_new = state.time + jnp.asarray(self.dt0, self.dtype)
        x2, x_old2 = self._hn_x0_jit(state, t_new, hfe, statics)

        prev = float("inf")
        res0 = None
        stall = 0
        d = 1.0
        tg = jnp.asarray(0, jnp.int32)
        iters = 0
        done = False
        res_dev = jnp.asarray(0.0, self.dtype)
        ew = cfg.newton_forcing == "ew"
        eta = cfg.newton_forcing_eta_max
        # Jacobian/preconditioner reuse (modified Newton) is a tile-path
        # optimization, exactly like the single-chip driver: frozen tile
        # blocks / diagonal / tables, TRUE residual each iteration.  (The
        # nodeblock inverses are rebuilt inside _hn_slv from the current
        # iterate — a slightly fresher preconditioner, harmless to FGMRES.)
        k_reuse = (
            max(1, int(cfg.newton_jacobian_reuse))
            if cfg.operator_path == "tile"
            else 1
        )
        frozen = None
        for it in range(cfg.newton_max_iterations):
            if k_reuse > 1 and it % k_reuse != 0 and frozen is not None:
                b_hat, res_dev, floor_dev = self._hn_rhs_jit(
                    x2, x_old2, t_new, th, hfe, statics, fe
                )
                diag2, tables, blocks = frozen
            else:
                b_hat, diag2, floor_dev, res_dev, tables, blocks = self._hn_asm_jit(
                    x2, x_old2, t_new, th, hfe, pops, statics, fe, self.htiles
                )
                if k_reuse > 1:
                    frozen = (diag2, tables, blocks)
            res, floor = (
                float(v) for v in np.asarray(jnp.stack([res_dev, floor_dev]))
            )
            if it == 0:
                res0 = res
            stall = stall + 1 if res > 0.9 * prev else 0
            if res < cfg.newton_tolerance or res < cfg.newton_rtol * res0:
                done = True
                break
            if stall >= 3:
                done = res <= cfg.newton_stall_floor_factor * floor
                if not done:
                    logging.getLogger(__name__).warning(
                        "halo Newton stalled at ||R||=%.3e (floor est %.3e) "
                        "after %d iterations — reporting non-convergence",
                        res, floor, it,
                    )
                break
            d1 = d
            if it > 0 and res > 0.99 * prev:
                d1 = max(0.05, d * 0.5)
            if res < 0.5 * prev and d1 < 1.0 - 1e-12:
                d1 = min(1.0, d1 * 1.5)
            if ew:
                eta = float(self._ew_eta(res, prev, eta, it, res0))
            rtol = eta if ew else cfg.gmres_rtol_newton
            x2, d_dev, its_dev = self._hn_slv_jit(
                x2, x_old2, b_hat, diag2, tables, blocks,
                jnp.asarray(d1, self.dtype), jnp.asarray(rtol, self.dtype),
                t_new, th, hfe, pops, statics, fe, self.htiles,
            )
            d = float(d_dev)  # pull
            tg = tg + its_dev
            prev = res
            iters += 1

        new_state, m = self._hn_fin_jit(
            state, t_new, x2.reshape(-1), jnp.asarray(done), tg,
            jnp.asarray(iters, jnp.int32), res_dev, hfe, statics,
        )
        return new_state, self._pull_metrics(m)

    # ------------------------------------------------------------------
    def step(self, state: State):
        """Host-side retry ladder (one compiled attempt program, k traced)."""
        if self.cfg.nonlinear_method == NonlinearMethod.NEWTON:
            if self._newton_host:
                return self._halo_newton_host_step(state)
            new_state, m = self._newton_jit(
                state, self.hfe, self.pressure_ops, self.statics, self.fe,
                self.htiles,
            )
            return new_state, self._pull_metrics(m)
        its_prev = 0
        for k in range(self._n_trials):
            new_state, m = self._attempt_jit(
                state, self._k_consts[k], self.hfe, self.pressure_ops,
                self.statics, self.fe, self.htiles,
            )
            m = self._pull_metrics(m)
            if m.converged or k == self._n_trials - 1:
                break
            its_prev += m.gmres_iters
        if its_prev:
            m = dataclasses.replace(m, gmres_iters=its_prev + m.gmres_iters)
        return new_state, m

    def run_async(self, n_steps: int, state: Optional[State] = None, window: int = 1):
        """Per-step loop (windowed dispatch is a single-layout feature)."""
        state = state if state is not None else self.initial_state()
        m = None
        for _ in range(n_steps):
            state, m = self.step(state)
        return state, m
