"""The solver facade: setup + jitted time stepping + driver loop.

TPU-native re-design of ``NavierStokes<dim>`` (reference:
src/classes/NavierStokes.hpp:226-603, NavierStokes.cpp:1044-1327).  One
entire time step — assembly, retry ladder / Newton iteration, FGMRES with
the Cahouet-Chabard preconditioner, benchmark functionals — is a single
jitted function of the solution state; the driver loop streams steps and
handles I/O (forces.txt, console log, VTU, checkpoints).

Robustness logic replicated from the reference:
  * CN first step executed as BE (cpp:1077-1081);
  * linearized path: in-step checkpoint + dt-halving retries (<=4) with a
    BE + first-order fallback on the first failure and a final forced-BE
    acceptance (cpp:1209-1289).  As in the reference, a retried step
    advances the physical fields by the *reduced* dt while the clock
    advances by the nominal dt;
  * Newton path: adaptive damping in [0.05, 1] with stall halving / growth,
    plus backtracking after a failed linear solve (cpp:1144-1201).
"""

from __future__ import annotations

import dataclasses
import logging
import time as _time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NonlinearMethod, SolverConfig, TimeScheme
from ..mesh import taylor_hood
from ..mesh.taylor_hood import THMesh
from ..ops import (
    assembly,
    dirichlet,
    fe_arrays,
    functionals,
    matfree,
    operators,
    tile_operator,
)
from ..solvers import gmres, preconditioners


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class State:
    """Time-marching state (all device arrays).

    The current solution always coincides with ``x_old`` after the history
    shift (reference: cpp:1299-1302), so it is not stored separately.
    """

    x_old: Any  # solution at t^n (= the current solution)
    x_old_old: Any  # solution at t^{n-1} (CN extrapolation)
    time: Any  # scalar
    step: Any  # int32
    first_step: Any  # bool scalar
    second_step: Any  # bool scalar


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepMetrics:
    time: Any
    drag: Any
    lift: Any
    delta_p: Any
    gmres_iters: Any
    newton_iters: Any
    converged: Any
    residual: Any
    dt_used: Any


class NavierStokesSolver:
    """End-to-end solver for one benchmark configuration on one mesh."""

    # The halo subclass builds PER-STRIP tile decompositions instead
    # (parallel/halo_tiles.py) and skips the global one.
    _build_single_chip_tiles = True

    def __init__(
        self,
        cfg: SolverConfig,
        mesh: THMesh | str,
        n_q1d: int = 3,
        pad_multiple: int = 1,
    ):
        self.cfg = cfg
        if isinstance(mesh, str):
            mesh = taylor_hood.load(mesh)
        if pad_multiple > 1:
            mesh = taylor_hood.pad_elements(mesh, pad_multiple)
        if mesh.dim != cfg.dim:
            raise ValueError(f"config is {cfg.dim}D but mesh is {mesh.dim}D")
        self.mesh = mesh

        dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        self.dtype = dtype
        self.fe = fe_arrays.build_fe_arrays(mesh, n_q1d=n_q1d, dtype=dtype)
        if cfg.operator_path == "tile" and self._build_single_chip_tiles:
            if cfg.tile_resident and cfg.precond_vel_method not in (
                "jacobi", "p1coarse", "p1coarse_mult"
            ):
                raise NotImplementedError(
                    "tile_resident Krylov supports velocity preconditioners "
                    f"jacobi/p1coarse/p1coarse_mult, not "
                    f"{cfg.precond_vel_method!r}; set tile_resident=False"
                )
            tiles = tile_operator.build_tile_arrays(
                mesh, self.fe, tile_e=cfg.tile_elements,
                cluster=cfg.tile_cluster,
            )
            if not cfg.use_supg:
                # Static S1/S2/G/H + quadrature tables enable the fast
                # per-step Oseen build (SUPG makes G and the test
                # functions dynamic — those cases use the generic build).
                statics = jax.jit(tile_operator.build_tile_statics)(
                    self.fe, tiles
                )
                tiles = dataclasses.replace(tiles, statics=statics)
            self.fe = dataclasses.replace(self.fe, tiles=tiles)
        self.dirichlet = dirichlet.build_dirichlet(mesh, self.fe, dtype=dtype)
        pin = dirichlet.pressure_pin_mask(mesh, self.fe)
        self.pressure_ops = preconditioners.build_pressure_operators(
            self.fe, pin, kp_regularization=cfg.kp_regularization,
            dense_max=cfg.precond_schur_dense_max,
            coords=mesh.vertices,  # enables the two-grid Schur beyond dense_max
            mesh=mesh, vel_mask=self.dirichlet.mask,
            p1_coarse=cfg.precond_vel_method.startswith("p1coarse"),
            kp_inv_storage=cfg.kp_inv_storage,
        )
        self.force_tables = functionals.build_force_tables(mesh, self.fe, dtype)
        self.probe_tables = functionals.build_probe_tables(mesh)

        self.dt0 = cfg.resolved_deltat()
        self.nu = cfg.nu
        self._step_jit = jax.jit(self._step, donate_argnums=(0,))
        # No donation: a failed trial re-uses the incoming state.
        self._attempt_jit = jax.jit(self._attempt_step)
        # Trial indices as device constants: uploading a fresh scalar every
        # step adds an H2D round-trip over the (remote) device link.
        self._k_consts = [jnp.asarray(k, jnp.int32) for k in range(self._n_trials)]
        # Host-driven Newton loop (bounded device-call length) for large
        # meshes — see config.newton_driver.
        self._newton_host = cfg.newton_driver == "host" or (
            cfg.newton_driver == "auto" and self.fe.n_dofs > 200_000
        )
        # Scale-safe stopping criterion: "auto" -> "defect" above the dof
        # threshold (see config.GMRES_CRITERION_AUTO_DOFS) so a fine-mesh
        # default-config run cannot freeze on warm-start tolerance error.
        from .. import config as _config

        self._gmres_criterion = _config.resolve_gmres_criterion(
            cfg.gmres_criterion, self.fe.n_dofs
        )
        if cfg.gmres_criterion == "auto" and self._gmres_criterion == "defect":
            print(
                f"gmres_criterion=auto: {self.fe.n_dofs} dofs > "
                f"{_config.GMRES_CRITERION_AUTO_DOFS} — using the 'defect' "
                "stopping criterion (scale-safe; docs/DESIGN.md accuracy "
                "cliff)",
                flush=True,
            )
        # Host-segmented linearized Krylov (bounded device-call length) for
        # large meshes — see config.linear_driver.  The fused attempt at
        # 1.36M dofs with the defect criterion packs up to
        # gmres_maxiter_linear iterations into ONE device program, which
        # the TPU worker kills ("crashed or restarted") exactly like the
        # minutes-long fused Newton step newton_driver guards against.
        self._linear_host = cfg.linear_driver == "host" or (
            cfg.linear_driver == "auto" and self.fe.n_dofs > 400_000
        )
        if cfg.operator_path == "element" and self._linear_host:
            raise NotImplementedError(
                "linear_driver='host' segments the matrix-free paths "
                "(quadrature/tile); the element path keeps the fused solve"
            )
        if cfg.tile_resident and self._linear_host:
            raise NotImplementedError(
                "linear_driver='host' and tile_resident=True are exclusive "
                "(the resident Krylov state lives inside one program)"
            )
        self._lin_setup_jit = jax.jit(self._lin_setup)
        self._lin_seg_jit = jax.jit(self._lin_segment)
        self._lin_fin_jit = jax.jit(self._lin_fin)
        self._newton_asm_jit = jax.jit(self._newton_asm_step)
        self._newton_slv_jit = jax.jit(self._newton_slv_step)
        self._newton_rhs_jit = jax.jit(self._newton_rhs_step)
        self._newton_ctx_jit = jax.jit(self._newton_ctx_step)
        self._newton_slv_ctx_jit = jax.jit(self._newton_slv_ctx_step)
        self._newton_fin_jit = jax.jit(self._newton_fin)
        self._newton_x0_jit = jax.jit(
            lambda state, t_new: jnp.where(
                self.dirichlet.mask,
                self.dirichlet.values(self.cfg.inlet_profile, t_new),
                state.x_old,
            )
        )
        # dt-normalized discrete rate ||x_new - x_old|| / (dt ||x_new||) —
        # the steady-state detector for Δt continuation (a relative
        # ||du/dt||; rate-based so the test is dt-invariant).
        self._steady_rate_jit = jax.jit(
            lambda x_new, x_old, dt: jnp.linalg.norm(x_new - x_old)
            / (dt * jnp.maximum(jnp.linalg.norm(x_new), 1e-30))
        )

    # ------------------------------------------------------------------
    def _schur_nu_mass(self):
        """Schur M_p coefficient: nu + gamma when config.schur_gd_mass
        resolves on (the grad-div-aware Cahouet-Chabard), else None (= nu)."""
        if self.cfg.schur_gd_mass_on():
            return self.nu + self.cfg.grad_div_gamma
        return None

    # ------------------------------------------------------------------
    def initial_state(self) -> State:
        """Interpolate the initial condition (reference: cpp:1047-1058)."""
        fe = self.fe
        x0 = np.zeros(fe.n_dofs, dtype=np.float64)
        ic = self.cfg.initial_condition
        if ic is not None:
            uvals = np.asarray(ic(self.mesh.vel_coords))  # (n_vnodes, dim+1)
            for d in range(fe.dim):
                x0[d * fe.n_vnodes : (d + 1) * fe.n_vnodes] = uvals[:, d]
            pvals = np.asarray(ic(self.mesh.vertices))
            x0[fe.n_udofs :] = pvals[:, fe.dim]
        x0 = jnp.asarray(x0, self.dtype)
        return State(
            x_old=x0,
            # Distinct buffer: the step function donates its inputs and a
            # donated buffer must not appear twice.
            x_old_old=jnp.array(x0, copy=True),
            time=jnp.asarray(0.0, self.dtype),
            step=jnp.asarray(0, jnp.int32),
            first_step=jnp.asarray(True),
            second_step=jnp.asarray(True),
        )

    # ------------------------------------------------------------------
    def _forcing_at(self, fe, t, dt_att):
        cfg = self.cfg
        if cfg.forcing is None:
            return None, None
        f_new = cfg.forcing(fe.qpoints, t)
        f_old = cfg.forcing(fe.qpoints, t - dt_att)
        return f_new, f_old

    def _solve_tile_resident(
        self, fe, pops, blk, b, g, dt, theta, x0, maxiter, rtol, diag, u_adv
    ):
        """Tile-RESIDENT linear solve: FGMRES on consistent tile-local slot
        vectors with owner-masked inner products (same mathematics as the
        nodal path; the per-iteration gather+accumulation shrinks to the
        inter-tile interface exchange — ops/tile_operator.py)."""
        cfg = self.cfg
        mask = self.dirichlet.mask
        tiles = fe.tiles
        op_l = tile_operator.make_tile_operator_local(fe, tiles, blk)
        b_hat = jnp.where(mask, g, b)
        x0 = jnp.where(mask, g, x0)
        bt = tile_operator.to_tiles(fe, tiles, b_hat)
        xt0 = tile_operator.to_tiles(fe, tiles, x0)
        mask_t = tile_operator.to_tiles(fe, tiles, mask)
        diag_t = tile_operator.to_tiles(fe, tiles, diag)
        # Pad slots and edge-slot pressure columns gather a 0 diagonal;
        # their residual entries are identically 0 — guard the division.
        diag_t = jnp.where(diag_t == 0, 1.0, diag_t)

        apply_t = lambda z: jnp.where(mask_t, z, op_l(z))
        precond = preconditioners.make_cahouet_chabard_local(
            fe, tiles, pops, op_l, mask, mask_t, diag_t,
            dt=dt, theta=theta, nu=self.nu, rho=cfg.rho,
            vel_method=cfg.precond_vel_method,
            p1_iters=cfg.precond_p1_iters, kp_iters=cfg.precond_kp_iters,
            twolevel_cycles=cfg.precond_twolevel_cycles,
            schur=cfg.precond_schur, u_adv=u_adv,
            gd_gamma=cfg.grad_div_gamma if cfg.use_supg else None,
            structure=cfg.precond_structure,
            schur_nu_mass=self._schur_nu_mass(),
        )
        res = gmres.fgmres(
            apply_t, bt, precond=precond, x0=xt0,
            restart=cfg.gmres_restart, maxiter=maxiter,
            rtol=cfg.gmres_rtol if rtol is None else rtol,
            alloc=cfg.gmres_alloc,
            weight=tiles.wmask.reshape(-1),
            criterion=self._gmres_criterion,
            dots=cfg.gmres_dots,
            defect_floor=cfg.gmres_defect_floor,
        )
        return res._replace(x=tile_operator.from_tiles(fe, tiles, res.x))

    def _solve_linear(
        self, fe, pops, A_e, b, g, dt, theta, x0, maxiter, rtol=None, op=None,
        diag=None, nodeblock_inv=None, u_adv=None, tile_blk=None,
    ):
        """Constrain, precondition and solve one linear system.

        ``op``: optional quadrature-path raw operator (ops/matfree.py) —
        every Krylov application goes through it.  ``diag``: precomputed
        global matrix diagonal; when given together with ``op``, the element
        matrices ``A_e`` are not needed at all (linearized fast path).
        ``tile_blk``: tile matrices — with cfg.tile_resident the whole
        Krylov loop then runs in tile-local space.
        """
        cfg = self.cfg
        if tile_blk is not None and cfg.tile_resident:
            return self._solve_tile_resident(
                fe, pops, tile_blk, b, g, dt, theta, x0, maxiter, rtol,
                diag, u_adv,
            )
        mask = self.dirichlet.mask
        n_u = fe.n_udofs
        if op is None:
            b_hat = operators.constrained_rhs(fe, A_e, b, mask, g)
            apply_a = operators.make_constrained_operator(fe, A_e, mask)
            vel_apply = div_apply = None
        else:
            # Row-constrained formulation: BC values ride on the warm start,
            # the g-correction folds into FGMRES's own initial residual —
            # one operator application per solve instead of two.
            b_hat = jnp.where(mask, g, b)
            x0 = jnp.where(mask, g, x0)
            apply_a = operators.row_constrain_operator(op, mask)

            def vel_apply(z):
                zf = jnp.where(mask, 0.0, z.at[n_u:].set(0.0))
                y = op.velocity_block(zf).at[n_u:].set(0.0)
                return jnp.where(mask, z, y)

            def div_apply(z_u):
                return op.divergence(jnp.where(mask, 0.0, z_u))

        precond = preconditioners.make_cahouet_chabard(
            fe, pops, A_e, mask,
            dt=dt, theta=theta, nu=self.nu, rho=cfg.rho,
            vel_sweeps=cfg.precond_vel_sweeps, kp_iters=cfg.precond_kp_iters,
            vel_method=cfg.precond_vel_method, vel_degree=cfg.precond_vel_degree,
            vel_apply=vel_apply, div_apply=div_apply, diag=diag,
            nodeblock_inv=nodeblock_inv,
            twolevel_cycles=cfg.precond_twolevel_cycles,
            p1_iters=cfg.precond_p1_iters,
            schur=cfg.precond_schur, u_adv=u_adv,
            gd_gamma=cfg.grad_div_gamma if cfg.use_supg else None,
            structure=cfg.precond_structure,
            schur_nu_mass=self._schur_nu_mass(),
        )
        res = gmres.fgmres(
            apply_a, b_hat, precond=precond, x0=x0,
            restart=cfg.gmres_restart, maxiter=maxiter,
            rtol=cfg.gmres_rtol if rtol is None else rtol,
            alloc=cfg.gmres_alloc,
            criterion=self._gmres_criterion,
            dots=cfg.gmres_dots,
            defect_floor=cfg.gmres_defect_floor,
        )
        return res

    def _global_diag(self, fe, diag_e):
        """Element-row diagonals -> safe global Jacobi diagonal."""
        diag = jnp.where(
            self.dirichlet.mask, 1.0, operators.scatter_add(fe, diag_e)
        )
        return jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)

    def _nodeblock_inv(self, fe, params, u_adv):
        """Per-node dim x dim velocity block inverses (precond_vel_method
        == "nodeblock"), or None for other velocity smoothers."""
        if self.cfg.precond_vel_method != "nodeblock":
            return None
        mask = self.dirichlet.mask
        Bn = assembly.oseen_nodeblock_diag(fe, params, u_adv)
        Bacc = fe.accumulate_nodes(
            Bn.reshape(fe.n_el, fe.n2, fe.dim * fe.dim)
        ).reshape(fe.n_vnodes, fe.dim, fe.dim)
        mu = mask[: fe.n_udofs].reshape(fe.dim, fe.n_vnodes).T
        either = mu[:, :, None] | mu[:, None, :]
        eye = jnp.eye(fe.dim, dtype=Bacc.dtype)
        return assembly.invert_spd_blocks(jnp.where(either, eye, Bacc))

    # --- linearized (Oseen) path --------------------------------------
    #
    # The retry ladder (reference: cpp:1209-1289) is expressed as a flat
    # trial sequence indexed by k:
    #   k=0: (dt0,      scheme theta)     — the nominal step
    #   k=1: (dt0,      BE + 1st order)   — fallback on first failure
    #   k=2..1+max_substeps: (dt0/2^(k-1), scheme theta)  — dt halvings
    #   k=2+max_substeps: (dt0/2^max_substeps, BE) — forced, accepted
    #                     whatever comes out.
    # k is a *traced* scalar, so one compiled "attempt" program serves all
    # trials.  The (rare) retry control flow runs on the host: jitting the
    # whole ladder as lax.while_loop(attempt) is supported (used by the scan
    # path) but triggers TPU compiler faults at large problem sizes, and a
    # per-step host sync is negligible against a multi-ms step.

    @property
    def _n_trials(self) -> int:
        return self.cfg.max_substeps + 3

    def _trial_params(self, k):
        dt0 = jnp.asarray(self.dt0, self.dtype)
        kf = k.astype(self.dtype)
        halvings = jnp.clip(kf - 1.0, 0.0, float(self.cfg.max_substeps))
        dt_att = dt0 * 0.5**halvings
        force_be = (k == 1) | (k == self._n_trials - 1)
        return dt_att, force_be

    def _lin_warm_start(self, state: State, u_star, fe):
        """Krylov start iterate for a linearized solve.

        "previous": x^n (the default — the reference starts from ZERO,
        cpp:849/560, so any warm start already beats its semantics).
        "extrap_u": velocity extrapolated to the clamped 2u^n - u^{n-1}
        (= the Oseen advection field u*, already computed), pressure held
        at p^n.  Full-state extrapolation was measured WORSE (13 -> 33
        its/step on 2D-2: the CN pressure mode is non-smooth step-to-step
        and extrapolating it amplifies it); velocity-only keeps the
        smooth part.  Dirichlet rows are overwritten with g downstream
        (row-constrained formulation), so the predictor never perturbs
        boundary values.
        """
        cfg = self.cfg
        if not cfg.gmres_warm_start:
            return jnp.zeros_like(state.x_old)
        if cfg.gmres_warm_start_mode == "extrap_u":
            _, p_old = fe.split(state.x_old)
            return fe.join(u_star, p_old)
        return state.x_old

    def _linearized_attempt(self, state: State, t_new, k, fe, pops):
        """One ladder trial (k traced): returns (x_new, ok, iters, dt_att)."""
        cfg = self.cfg
        theta0 = jnp.asarray(cfg.theta, self.dtype)
        theta_eff = jnp.where(
            state.first_step & (cfg.time_scheme == TimeScheme.CRANK_NICOLSON),
            jnp.asarray(1.0, self.dtype),
            theta0,
        )
        g = self.dirichlet.values(cfg.inlet_profile, t_new)
        u_old, _ = fe.split(state.x_old)
        u_oo, _ = fe.split(state.x_old_old)
        is_be = cfg.time_scheme == TimeScheme.BACKWARD_EULER
        dt_att, force_be = self._trial_params(k)
        th = jnp.where(force_be, jnp.asarray(1.0, self.dtype), theta_eff)
        first_order = state.first_step | state.second_step | force_be | is_be
        u_star = assembly.extrapolate_advection(u_old, u_oo, first_order)
        x_start = self._lin_warm_start(state, u_star, fe)
        params = assembly.StepParams(
            dt=dt_att, theta=th, nu=jnp.asarray(self.nu, self.dtype),
            rho=cfg.rho, gamma=cfg.grad_div_gamma, use_supg=cfg.use_supg,
        )
        f_new, f_old = self._forcing_at(fe, t_new, dt_att)
        if cfg.operator_path == "quadrature":
            # Fast path: never form the (nd, nd) element matrices — the
            # Krylov operator is the quadrature-path apply, and the
            # preconditioner needs only the matrix diagonal.
            diag_e, b_e = assembly.oseen_rhs_diag(fe, params, u_star, u_old, f_new, f_old)
            b = operators.scatter_add(fe, b_e)
            diag = self._global_diag(fe, diag_e)
            nodeblock_inv = self._nodeblock_inv(fe, params, u_star)
            op = matfree.make_system_operator(fe, params, u_star)
            res = self._solve_linear(
                fe, pops, None, b, g, dt_att, th, x_start,
                cfg.gmres_maxiter_linear, op=op, diag=diag,
                nodeblock_inv=nodeblock_inv, u_adv=u_star,
            )
        elif cfg.operator_path == "tile":
            # Assembled path: the operator is reduced ONCE per attempt to
            # per-tile dense node-block matrices; every Krylov application
            # is then one slot gather + batched MXU matvecs
            # (ops/tile_operator.py) instead of re-deriving the form.
            # RHS + Jacobi diagonal come from the quadrature-path kernel.
            diag_e, b_e = assembly.oseen_rhs_diag(
                fe, params, u_star, u_old, f_new, f_old
            )
            b = operators.scatter_add(fe, b_e)
            diag = self._global_diag(fe, diag_e)
            nodeblock_inv = self._nodeblock_inv(fe, params, u_star)
            if cfg.use_supg:
                dvv, cvv, avp, apv, _ = assembly.oseen_blocks(
                    fe, params, u_star, u_old, f_new, f_old
                )
                blk = tile_operator.build_tile_blocks(
                    fe, fe.tiles, dvv, cvv, avp, apv
                )
            else:
                # Fast build: static S1/S2/G/H + one convection matmul.
                blk = tile_operator.build_tile_blocks_oseen(
                    fe, fe.tiles, params, u_star
                )
            op = tile_operator.make_tile_operator(fe, fe.tiles, blk)
            res = self._solve_linear(
                fe, pops, None, b, g, dt_att, th, x_start,
                cfg.gmres_maxiter_linear, op=op, diag=diag,
                nodeblock_inv=nodeblock_inv, u_adv=u_star, tile_blk=blk,
            )
        else:
            A_e, b_e = assembly.oseen_system(fe, params, u_star, u_old, f_new, f_old)
            b = operators.scatter_add(fe, b_e)
            res = self._solve_linear(
                fe, pops, A_e, b, g, dt_att, th, x_start,
                cfg.gmres_maxiter_linear, u_adv=u_star,
            )
        return res.x, res.converged, res.iterations, dt_att

    def _linearized_advance(self, state: State, t_new, fe, pops):
        """Jitted in-graph ladder (used by run_scan / dryrun)."""
        n_trials = self._n_trials

        def ladder_cond(c):
            k, accepted, _, _, _, _ = c
            return (~accepted) & (k < n_trials)

        def ladder_body(c):
            k, _, _, x, its, _ = c
            x1, ok1, it1, dt_att = self._linearized_attempt(state, t_new, k, fe, pops)
            # The last (forced-BE) trial is always accepted (cpp:1281-1282),
            # but the reported convergence flag stays truthful.
            accepted = ok1 | (k == n_trials - 1)
            return k + 1, accepted, ok1, x1, its + it1, dt_att

        init = (
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.zeros_like(state.x_old),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(self.dt0, self.dtype),
        )
        k, _, ok, x_final, its, dt_att = jax.lax.while_loop(ladder_cond, ladder_body, init)
        return x_final, ok, its, dt_att, jnp.asarray(0, jnp.int32), jnp.asarray(0.0, self.dtype)

    # --- Newton path ----------------------------------------------------
    def _newton_params(self, theta, dt=None):
        """Step parameters; ``dt`` may be a traced scalar (Δt continuation —
        the continuation driver re-uses ONE compiled program across the
        whole growing-dt ladder by passing dt as an argument)."""
        cfg = self.cfg
        return assembly.StepParams(
            dt=jnp.asarray(self.dt0, self.dtype) if dt is None else dt,
            theta=theta,
            nu=jnp.asarray(self.nu, self.dtype), rho=cfg.rho,
            gamma=cfg.grad_div_gamma, use_supg=cfg.use_supg,
        )

    def _newton_residual_system(self, fe, params, x, u_old, f_new, f_old):
        """(A_e | global diagonal, constrained rhs, roundoff floor) at ``x``.

        On the quadrature path the Newton iteration never forms the
        (nd, nd) element matrices: the Krylov operator is the matfree
        Jacobian apply and the preconditioner needs only the diagonal
        (assembly.newton_rhs_diag) — the dominant per-iteration assembly
        cost in the matrix path.

        The returned ``floor`` estimates the attainable residual norm in
        the working precision: inter-element cancellation dominates the
        roundoff near convergence, so the per-row error is bounded by
        eps * sum_e |b_e| and ||R||_floor ~ eps * || scatter_add(|b_e|) ||.
        The stall exit uses it to distinguish converged-to-floor from a
        genuinely diverging iteration.
        """
        mask = self.dirichlet.mask
        u, p = fe.split(x)
        if self.cfg.operator_path == "quadrature":
            diag_e, b_e = assembly.newton_rhs_diag(
                fe, params, u, p, u_old, f_new, f_old
            )
            Ad = jnp.where(mask, 1.0, operators.scatter_add(fe, diag_e))
            Ad = jnp.where(jnp.abs(Ad) > 1e-30, Ad, 1.0)
        elif self.cfg.operator_path == "tile":
            # ``Ad`` carries the physical blocks; the linear solve reduces
            # them to tile matrices once per Newton iteration.
            dvv, cvv, avp, apv, b_v, b_p = assembly.newton_blocks(
                fe, params, u, p, u_old, f_new, f_old
            )
            Ad = (dvv, cvv, avp, apv)
            b_e = assembly.rhs_to_element(fe, b_v, b_p)
        else:
            Ad, b_e = assembly.newton_system(fe, params, u, p, u_old, f_new, f_old)
        b = operators.scatter_add(fe, b_e)
        eps = jnp.finfo(b.dtype).eps
        floor = eps * jnp.linalg.norm(
            jnp.where(mask, 0.0, operators.scatter_add(fe, jnp.abs(b_e)))
        )
        # Homogeneous constraints on the update (g = 0): rhs rows zeroed.
        b_hat = jnp.where(mask, 0.0, b)
        return Ad, b_hat, floor

    def _newton_rhs_floor(self, fe, params, x, u_old, f_new, f_old):
        """Residual RHS + roundoff floor WITHOUT the Jacobian (reuse path).

        Exactly the ``(b_hat, floor)`` of :meth:`_newton_residual_system`
        via the diagonal-only assembly (the byproduct diagonal is
        discarded) — used on Jacobian-reuse iterations
        (cfg.newton_jacobian_reuse > 1), where the operator and
        preconditioner are frozen but the outer stopping test must see
        the TRUE residual at the current iterate.
        """
        mask = self.dirichlet.mask
        u, p = fe.split(x)
        _, b_e = assembly.newton_rhs_diag(fe, params, u, p, u_old, f_new, f_old)
        b = operators.scatter_add(fe, b_e)
        eps = jnp.finfo(b.dtype).eps
        floor = eps * jnp.linalg.norm(
            jnp.where(mask, 0.0, operators.scatter_add(fe, jnp.abs(b_e)))
        )
        return jnp.where(mask, 0.0, b), floor

    def _newton_tile_ctx(self, fe, x, Ad):
        """Reduce Newton physical blocks to the reusable solve context.

        ``(global diagonal, tile matrices, linearization velocity)`` — all
        the iterate-dependent state the tile-path linear solve needs; on
        reuse iterations the previous context is passed back in unchanged
        (frozen Jacobian AND frozen preconditioner inputs).
        """
        u_x, _ = fe.split(x)
        dvv, cvv, avp, apv = Ad
        diag = self._global_diag(fe, assembly.blocks_diag(fe, dvv, cvv))
        blk = tile_operator.build_tile_blocks(fe, fe.tiles, dvv, cvv, avp, apv)
        return diag, blk, u_x

    def _ew_eta(self, res, prev, eta_prev, it, res0):
        """Eisenstat-Walker choice-2 forcing term for the NEXT inner solve.

        eta_k = gamma (||F_k||/||F_{k-1}||)^alpha, safeguarded by
        gamma*eta_{k-1}^alpha (when > 0.1) so the tolerance cannot collapse
        after one lucky step, floored against oversolving past the outer
        stopping test (max of the absolute and relative criteria), clamped
        to [eta_min, eta_max].  Works traced (jnp scalars) and on host
        floats.  [Eisenstat & Walker, SISC 17(1), 1996, eq. 2.6.]
        """
        cfg = self.cfg
        g, a = cfg.newton_forcing_gamma, cfg.newton_forcing_alpha
        raw = g * (res / jnp.maximum(prev, 1e-300)) ** a
        sg = g * eta_prev**a
        eta = jnp.where(sg > 0.1, jnp.maximum(raw, sg), raw)
        # Non-descent safeguard: choice 2 LOOSENS on stagnation (res ~ prev
        # gives eta ~ gamma, clamped to eta_max) — exactly backwards when
        # the last direction was too inexact to descend.  Measured failure:
        # 3D-1Z SUPG at 666k dofs, every step's Newton stalled at
        # ||R||~2e-3 from iteration 0 with eta pinned at eta_max=0.5.  If
        # the residual failed the damping ladder's own 0.9 descent test,
        # tighten geometrically instead (rescues within the 3-iteration
        # stall budget: 0.5 -> 0.05 -> 0.005).
        eta = jnp.where(res > 0.9 * prev, 0.1 * eta_prev, eta)
        eta = jnp.where(it == 0, cfg.newton_forcing_eta_max, eta)
        target = jnp.maximum(cfg.newton_tolerance, cfg.newton_rtol * res0)
        over = 0.5 * target / jnp.maximum(res, 1e-300)
        return jnp.clip(
            jnp.maximum(eta, over),
            cfg.newton_forcing_eta_min, cfg.newton_forcing_eta_max,
        )

    def _newton_linear_solve(self, fe, pops, params, x, b_hat, Ad, d1, resid_args,
                             rtol=None, tile_ctx=None):
        """Damped update x + d2*dx with post-failure backtracking (jittable).

        Mirrors NavierStokes.cpp:1171-1198; ``d1`` is the pre-solve damping,
        the returned damping reflects the linear-failure reduction.
        ``rtol``: inner forcing term (traced ok; defaults to the fixed
        cfg.gmres_rtol_newton).  ``tile_ctx``: prebuilt (possibly FROZEN,
        cfg.newton_jacobian_reuse) tile solve context from
        :meth:`_newton_tile_ctx`; when given, ``Ad`` is unused.
        """
        cfg = self.cfg
        quad = cfg.operator_path == "quadrature"
        tile = cfg.operator_path == "tile"
        op = None
        diag = None
        u_x, _ = fe.split(x)
        blk = None
        if quad:
            # Ad IS the global Jacobian diagonal (newton_rhs_diag).
            op = matfree.make_system_operator(fe, params, u_x, newton_reaction=True)
            diag = Ad
        elif tile:
            if tile_ctx is not None:
                diag, blk, u_x = tile_ctx
            else:
                # Ad carries the Jacobian's physical blocks; reduce them to
                # tile matrices once — the Krylov applications amortize it.
                diag, blk, u_x = self._newton_tile_ctx(fe, x, Ad)
            op = tile_operator.make_tile_operator(fe, fe.tiles, blk)
        nodeblock_inv = self._nodeblock_inv(fe, params, u_x)
        sol = self._solve_linear(
            fe, pops, Ad if op is None else None, b_hat,
            jnp.zeros_like(b_hat), params.dt, params.theta,
            jnp.zeros_like(x), cfg.gmres_maxiter_newton,
            rtol=cfg.gmres_rtol_newton if rtol is None else rtol, op=op,
            diag=diag, u_adv=u_x,
            nodeblock_inv=nodeblock_inv, tile_blk=blk,
        )
        lin_ok = sol.converged
        d2 = jnp.where(lin_ok, d1, jnp.maximum(0.05, d1 * 0.25))
        x_new = x + d2 * sol.x
        res = jnp.linalg.norm(b_hat)

        def backtrack(args):
            x_new, d2 = args
            _, b2, _ = self._newton_residual_system(
                fe, params, x_new, resid_args[0], resid_args[1], resid_args[2]
            )
            new_res = jnp.linalg.norm(b2)
            bad = new_res > 2.0 * res
            d3 = jnp.where(bad, jnp.maximum(0.01, d2 * 0.5), d2)
            x_bt = jnp.where(bad, x + d3 * sol.x, x_new)
            return x_bt, d3

        x_out, d_out = jax.lax.cond(
            ~lin_ok, backtrack, lambda a: a, (x_new, d2)
        )
        return x_out, d_out, sol.iterations

    # --- host-driven Newton loop (bounded device-call length) -----------
    def _newton_asm_step(self, x, x_old, t_new, theta, fe, pops, dt=None):
        params = self._newton_params(theta, dt)
        u_old, _ = fe.split(x_old)
        f_new, f_old = self._forcing_at(fe, t_new, params.dt)
        Ad, b_hat, floor = self._newton_residual_system(
            fe, params, x, u_old, f_new, f_old
        )
        return Ad, b_hat, jnp.linalg.norm(b_hat), floor

    def _newton_slv_step(self, x, x_old, b_hat, Ad, t_new, theta, d1, rtol,
                         fe, pops, dt=None):
        params = self._newton_params(theta, dt)
        u_old, _ = fe.split(x_old)
        f_new, f_old = self._forcing_at(fe, t_new, params.dt)
        return self._newton_linear_solve(
            fe, pops, params, x, b_hat, Ad, d1, (u_old, f_new, f_old),
            rtol=rtol,
        )

    def _newton_rhs_step(self, x, x_old, t_new, theta, fe, dt=None):
        """Residual-only device call for Jacobian-reuse iterations."""
        params = self._newton_params(theta, dt)
        u_old, _ = fe.split(x_old)
        f_new, f_old = self._forcing_at(fe, t_new, params.dt)
        b_hat, floor = self._newton_rhs_floor(fe, params, x, u_old, f_new, f_old)
        return b_hat, jnp.linalg.norm(b_hat), floor

    def _newton_ctx_step(self, x, Ad, fe):
        return self._newton_tile_ctx(fe, x, Ad)

    def _newton_slv_ctx_step(self, x, x_old, b_hat, ctx, t_new, theta, d1,
                             rtol, fe, pops, dt=None):
        """Linear solve against a (possibly frozen) prebuilt tile context."""
        params = self._newton_params(theta, dt)
        u_old, _ = fe.split(x_old)
        f_new, f_old = self._forcing_at(fe, t_new, params.dt)
        return self._newton_linear_solve(
            fe, pops, params, x, b_hat, None, d1, (u_old, f_new, f_old),
            rtol=rtol, tile_ctx=ctx,
        )

    def _newton_fin(self, state, t_new, x, ok, its, nits, res, fe, dt=None):
        return self._finalize(
            state, t_new, fe, x, ok, its,
            jnp.asarray(self.dt0, self.dtype) if dt is None else dt,
            nits, res,
        )

    def _newton_host_step(self, state: State, dt=None) -> tuple[State, StepMetrics]:
        """Host-driven damped Newton (reference: NavierStokes.cpp:1144-1201).

        One jitted device call per assembly and per linear solve keeps every
        device program seconds-long — a fully-jitted 3D step packs minutes
        of work into ONE program, which the (axon) TPU worker kills as a
        fault.  Costs two scalar pulls per Newton iteration (~70 ms),
        negligible against large-mesh iteration times.

        ``dt`` (optional device scalar) overrides the nominal step — the Δt
        continuation driver passes the growing step through here so every
        dt in the ladder reuses the SAME compiled programs.
        """
        cfg = self.cfg
        fe, pops = self.fe, self.pressure_ops
        first = bool(state.first_step)  # one pull
        theta_eff = (
            1.0
            if (first and cfg.time_scheme == TimeScheme.CRANK_NICOLSON)
            else cfg.theta
        )
        th = jnp.asarray(theta_eff, self.dtype)
        t_new = state.time + (
            jnp.asarray(self.dt0, self.dtype) if dt is None else dt
        )
        x = self._newton_x0_jit(state, t_new)

        prev = float("inf")
        res0 = None
        stall = 0
        d = 1.0
        tg = jnp.asarray(0, jnp.int32)
        iters = 0
        done = False
        res = float("inf")
        res_dev = jnp.asarray(0.0, self.dtype)
        ew = cfg.newton_forcing == "ew"
        eta = cfg.newton_forcing_eta_max
        k_reuse = (
            max(1, int(cfg.newton_jacobian_reuse))
            if cfg.operator_path == "tile"
            else 1
        )
        ctx = None
        for it in range(cfg.newton_max_iterations):
            if k_reuse > 1 and it % k_reuse != 0:
                # Frozen Jacobian/preconditioner; TRUE residual (modified
                # Newton — the outer stopping test stays exact).
                b_hat, res_dev, floor_dev = self._newton_rhs_jit(
                    x, state.x_old, t_new, th, fe, dt=dt
                )
                Ad = None
            else:
                Ad, b_hat, res_dev, floor_dev = self._newton_asm_jit(
                    x, state.x_old, t_new, th, fe, pops, dt=dt
                )
                if k_reuse > 1:
                    ctx = self._newton_ctx_jit(x, Ad, fe)
            # One stacked pull (the res/floor pair shares a round-trip).
            res, floor = (float(v) for v in np.asarray(jnp.stack([res_dev, floor_dev])))
            if it == 0:
                res0 = res
            stall = stall + 1 if res > 0.9 * prev else 0
            if res < cfg.newton_tolerance or res < cfg.newton_rtol * res0:
                done = True
                break
            if stall >= 3:
                # The damping ladder is cycling; only a residual sitting at
                # the assembly roundoff floor counts as converged
                # (reference never fakes convergence, cpp:1155-1169).
                done = res <= cfg.newton_stall_floor_factor * floor
                if not done:
                    logging.getLogger(__name__).warning(
                        "Newton stalled at ||R||=%.3e (floor est %.3e) after "
                        "%d iterations — reporting non-convergence", res, floor, it
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
            if k_reuse > 1:
                x, d_dev, its_dev = self._newton_slv_ctx_jit(
                    x, state.x_old, b_hat, ctx, t_new, th,
                    jnp.asarray(d1, self.dtype), jnp.asarray(rtol, self.dtype),
                    fe, pops, dt=dt,
                )
            else:
                x, d_dev, its_dev = self._newton_slv_jit(
                    x, state.x_old, b_hat, Ad, t_new, th,
                    jnp.asarray(d1, self.dtype), jnp.asarray(rtol, self.dtype),
                    fe, pops, dt=dt,
                )
            d = float(d_dev)  # pull #2
            tg = tg + its_dev
            prev = res
            iters += 1

        new_state, m = self._newton_fin_jit(
            state, t_new, x, jnp.asarray(done), tg,
            jnp.asarray(iters, jnp.int32), res_dev, fe, dt=dt,
        )
        return new_state, self._pull_metrics(m)

    def _newton_advance(self, state: State, t_new, fe, pops):
        cfg = self.cfg
        mask = self.dirichlet.mask
        theta_eff = jnp.where(
            state.first_step & (cfg.time_scheme == TimeScheme.CRANK_NICOLSON),
            jnp.asarray(1.0, self.dtype),
            jnp.asarray(cfg.theta, self.dtype),
        )
        dt0 = jnp.asarray(self.dt0, self.dtype)
        g = self.dirichlet.values(cfg.inlet_profile, t_new)
        u_old, _ = fe.split(state.x_old)
        params = assembly.StepParams(
            dt=dt0, theta=theta_eff, nu=jnp.asarray(self.nu, self.dtype),
            rho=cfg.rho, gamma=cfg.grad_div_gamma, use_supg=cfg.use_supg,
        )
        f_new, f_old = self._forcing_at(fe, t_new, dt0)

        def residual_system(x):
            return self._newton_residual_system(fe, params, x, u_old, f_new, f_old)

        # Lift the non-homogeneous BCs onto the iterate (cpp:1118-1142).
        x0 = jnp.where(mask, g, state.x_old)

        big = jnp.asarray(1e10, self.dtype)
        tol = cfg.newton_tolerance

        ew = cfg.newton_forcing == "ew"
        # Jacobian reuse (modified Newton) is a tile-path optimization: the
        # quadrature matfree apply re-derives the weak form per application,
        # so freezing buys nothing there.
        k_reuse = (
            max(1, int(cfg.newton_jacobian_reuse))
            if cfg.operator_path == "tile"
            else 1
        )

        def full_asm(x):
            Ad, b_hat, floor = residual_system(x)
            return self._newton_tile_ctx(fe, x, Ad), b_hat, floor

        if k_reuse > 1:
            # Shape-only trace: a zero context of the right pytree for the
            # loop init (never consumed — iteration 0 always rebuilds).
            ctx_shape = jax.eval_shape(lambda x: full_asm(x)[0], x0)
            ctx0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), ctx_shape
            )
        else:
            ctx0 = None

        def cond(c):
            x, res, prev, res0, stall, damping, eta, it, tg, done, ok = c[:11]
            return (~done) & (it < cfg.newton_max_iterations)

        def body(c):
            x, res_in, prev, res0, stall, damping, eta_prev, it, tg = c[:9]
            ctx = c[11] if k_reuse > 1 else None
            if k_reuse > 1:
                ctx, b_hat, floor = jax.lax.cond(
                    it % k_reuse == 0,
                    full_asm,
                    lambda x: (ctx,) + self._newton_rhs_floor(
                        fe, params, x, u_old, f_new, f_old),
                    x,
                )
                Ad = None
            else:
                Ad, b_hat, floor = residual_system(x)
            res = jnp.linalg.norm(b_hat)
            res0 = jnp.where(it == 0, res, res0)
            # f32 assembly roundoff floors ||R|| around eps*|terms|*sqrt(n)
            # (~1e-4 at 1e5 dofs) — no tolerance is satisfiable below it, so
            # three consecutive iterations with <10% reduction stop the
            # iteration (the damping ladder would keep alpha shrinking,
            # cpp:1163-1169).  A stall only REPORTS converged when the
            # residual sits at the estimated roundoff floor; a genuinely
            # diverging Newton exits with ok=False (cpp:1155-1169 never
            # fakes convergence).
            stall = jnp.where(res > 0.9 * prev, stall + 1, 0)
            tol_hit = (res < tol) | (res < cfg.newton_rtol * res0)
            at_floor = res <= cfg.newton_stall_floor_factor * floor
            done = tol_hit | (stall >= 3)
            ok = tol_hit | ((stall >= 3) & at_floor)
            eta = (
                self._ew_eta(res, prev, eta_prev, it, res0)
                if ew
                else eta_prev
            )

            def do_update(_):
                # Adaptive damping (cpp:1163-1169).
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
                return self._newton_linear_solve(
                    fe, pops, params, x, b_hat, Ad, d1, (u_old, f_new, f_old),
                    rtol=eta if ew else None, tile_ctx=ctx,
                )

            def no_update(_):
                return x, damping, jnp.asarray(0, jnp.int32)

            x_out, d_out, g_its = jax.lax.cond(~done, do_update, no_update, None)
            out = (
                x_out, res, res, res0, stall, d_out, eta,
                it + jnp.where(done, 0, 1), tg + g_its, done, ok,
            )
            return out + (ctx,) if k_reuse > 1 else out

        init = (
            x0, big, big, big, jnp.asarray(0, jnp.int32),
            jnp.asarray(1.0, self.dtype),
            jnp.asarray(cfg.newton_forcing_eta_max, self.dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32), jnp.asarray(False), jnp.asarray(False),
        )
        if k_reuse > 1:
            init = init + (ctx0,)
        fin = jax.lax.while_loop(cond, body, init)
        x, res, _, _, _, _, _, iters, total_gmres, _, ok = fin[:11]
        # Hitting the iteration cap without meeting any criterion is also
        # honest non-convergence (ok stays False from the last body pass).
        return x, ok, total_gmres, dt0, iters, res

    # ------------------------------------------------------------------
    def _finalize(self, state: State, t_new, fe, x_new, ok, gmres_its, dt_used, newton_its, resid):
        """Functionals + history shift (reference: cpp:1299-1310)."""
        cfg = self.cfg
        u, p = fe.split(x_new)
        cd, cl = functionals.lift_drag(
            fe, self.force_tables, u, p, nu=self.nu, rho=cfg.rho, U_m=cfg.U_m
        )
        dp = functionals.pressure_difference(fe, self.probe_tables, p)

        new_state = State(
            x_old=x_new,
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

    def _step(self, state: State, fe=None, pops=None) -> tuple[State, StepMetrics]:
        """One full time step with the in-graph retry ladder.

        ``fe`` and ``pops`` are jit *arguments* (not closure captures) so
        their arrays — including the dense K_p inverse, which can reach GBs
        on fine meshes — stay device-resident buffers instead of being
        embedded in the program as constants.
        """
        cfg = self.cfg
        if fe is None:
            fe = self.fe
        if pops is None:
            pops = self.pressure_ops
        t_new = state.time + jnp.asarray(self.dt0, self.dtype)

        if cfg.nonlinear_method == NonlinearMethod.NEWTON:
            adv = self._newton_advance(state, t_new, fe, pops)
        else:
            adv = self._linearized_advance(state, t_new, fe, pops)
        return self._finalize(state, t_new, fe, *adv)

    def _attempt_step(self, state: State, k, fe, pops) -> tuple[State, StepMetrics]:
        """One ladder-trial step (k traced) — the host-ladder unit."""
        t_new = state.time + jnp.asarray(self.dt0, self.dtype)
        x_new, ok, its, dt_att = self._linearized_attempt(state, t_new, k, fe, pops)
        return self._finalize(
            state, t_new, fe, x_new, ok, its, dt_att,
            jnp.asarray(0, jnp.int32), jnp.asarray(0.0, self.dtype),
        )

    # --- host-segmented linearized Krylov (config.linear_driver) --------
    #
    # The fused attempt program contains the FULL FGMRES while_loop: its
    # device-call length grows with the iteration count, and the TPU
    # worker kills calls that run minutes (the 1.36M-dof defect-criterion
    # attempt died this way).  These three jitted pieces bound every call:
    # setup (assembly + operator ingredients + the stopping tolerance),
    # a gmres_segment_its-iteration FGMRES segment (host-looped; a
    # segment boundary is mathematically a GMRES restart), finalize.
    # The stopping tolerance is computed ONCE in setup and passed to every
    # segment as an absolute tolerance — recomputing the defect norm per
    # segment would relax the criterion as x improves.

    def _lin_trial_setup(self, state: State, k, fe):
        """Shared trial parameterization (mirrors _linearized_attempt)."""
        cfg = self.cfg
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
        return dt_att, th, first_order

    def _lin_params(self, dt_att, th):
        cfg = self.cfg
        return assembly.StepParams(
            dt=dt_att, theta=th, nu=jnp.asarray(self.nu, self.dtype),
            rho=cfg.rho, gamma=cfg.grad_div_gamma, use_supg=cfg.use_supg,
        )

    def _lin_setup(self, state: State, k, fe, pops):
        """Jitted piece 1: assembly + operator ingredients + tolerance."""
        cfg = self.cfg
        t_new = state.time + jnp.asarray(self.dt0, self.dtype)
        dt_att, th, first_order = self._lin_trial_setup(state, k, fe)
        params = self._lin_params(dt_att, th)
        g = self.dirichlet.values(cfg.inlet_profile, t_new)
        u_old, _ = fe.split(state.x_old)
        u_oo, _ = fe.split(state.x_old_old)
        u_star = assembly.extrapolate_advection(u_old, u_oo, first_order)
        x_start = self._lin_warm_start(state, u_star, fe)
        f_new, f_old = self._forcing_at(fe, t_new, dt_att)
        diag_e, b_e = assembly.oseen_rhs_diag(fe, params, u_star, u_old, f_new, f_old)
        b = operators.scatter_add(fe, b_e)
        diag = self._global_diag(fe, diag_e)
        nbinv = self._nodeblock_inv(fe, params, u_star)
        if cfg.operator_path == "tile":
            if cfg.use_supg:
                dvv, cvv, avp, apv, _ = assembly.oseen_blocks(
                    fe, params, u_star, u_old, f_new, f_old
                )
                tb = tile_operator.build_tile_blocks(fe, fe.tiles, dvv, cvv, avp, apv)
            else:
                tb = tile_operator.build_tile_blocks_oseen(fe, fe.tiles, params, u_star)
            op = tile_operator.make_tile_operator(fe, fe.tiles, tb)
        else:
            tab = matfree.advection_tables(fe, params, u_star)
            tb = tuple(t for t in tab if t is not None)
            op = matfree.make_system_operator(fe, params, tables=tab)
        mask = self.dirichlet.mask
        b_hat = jnp.where(mask, g, b)
        x0 = jnp.where(mask, g, x_start)
        apply_a = operators.row_constrain_operator(op, mask)
        # Stopping tolerance — same rule as gmres.fgmres, fixed per trial.
        b_norm = jnp.linalg.norm(b_hat)
        if self._gmres_criterion == "defect":
            tol = jnp.maximum(
                cfg.gmres_rtol * jnp.linalg.norm(b_hat - apply_a(x0)),
                cfg.gmres_defect_floor * b_norm,
            )
        else:
            tol = cfg.gmres_rtol * b_norm
        return b_hat, x0, tol, diag, nbinv, u_star, tb, dt_att, th

    def _lin_segment(self, x, b_hat, tol, diag, nbinv, u_star, tb, dt_att, th,
                     fe, pops):
        """Jitted piece 2: one bounded FGMRES segment from iterate ``x``."""
        cfg = self.cfg
        params = self._lin_params(dt_att, th)
        if cfg.operator_path == "tile":
            op = tile_operator.make_tile_operator(fe, fe.tiles, tb)
        else:
            it = iter(tb)
            tab = (next(it), next(it), None, next(it) if cfg.use_supg else None)
            op = matfree.make_system_operator(fe, params, tables=tab)
        mask = self.dirichlet.mask
        n_u = fe.n_udofs
        apply_a = operators.row_constrain_operator(op, mask)

        def vel_apply(z):
            zf = jnp.where(mask, 0.0, z.at[n_u:].set(0.0))
            y = op.velocity_block(zf).at[n_u:].set(0.0)
            return jnp.where(mask, z, y)

        def div_apply(z_u):
            return op.divergence(jnp.where(mask, 0.0, z_u))

        precond = preconditioners.make_cahouet_chabard(
            fe, pops, None, mask,
            dt=dt_att, theta=th, nu=self.nu, rho=cfg.rho,
            vel_sweeps=cfg.precond_vel_sweeps, kp_iters=cfg.precond_kp_iters,
            vel_method=cfg.precond_vel_method, vel_degree=cfg.precond_vel_degree,
            vel_apply=vel_apply, div_apply=div_apply, diag=diag,
            nodeblock_inv=nbinv,
            twolevel_cycles=cfg.precond_twolevel_cycles,
            p1_iters=cfg.precond_p1_iters,
            schur=cfg.precond_schur, u_adv=u_star,
            gd_gamma=cfg.grad_div_gamma if cfg.use_supg else None,
            structure=cfg.precond_structure,
            schur_nu_mass=self._schur_nu_mass(),
        )
        seg = cfg.gmres_segment_its
        res = gmres.fgmres(
            apply_a, b_hat, precond=precond, x0=x,
            restart=min(seg, cfg.gmres_restart), maxiter=seg,
            rtol=0.0, atol=tol, alloc=cfg.gmres_alloc,
            criterion="rhs", dots=cfg.gmres_dots,
        )
        return res.x, res.converged, res.iterations, res.residual

    def _lin_fin(self, state: State, k, x, ok, its, fe, pops):
        """Jitted piece 3: accept the trial iterate (functionals + shift)."""
        t_new = state.time + jnp.asarray(self.dt0, self.dtype)
        dt_att, _, _ = self._lin_trial_setup(state, k, fe)
        return self._finalize(
            state, t_new, fe, x, ok, its, dt_att,
            jnp.asarray(0, jnp.int32), jnp.asarray(0.0, self.dtype),
        )

    def _attempt_host(self, state: State, k: int):
        """One ladder trial with host-segmented FGMRES (device metrics)."""
        cfg = self.cfg
        fe, pops = self.fe, self.pressure_ops
        kc = self._k_consts[k]
        b_hat, x, tol, diag, nbinv, u_star, tb, dt_att, th = self._lin_setup_jit(
            state, kc, fe, pops
        )
        total = 0
        ok = False
        n_segs = -(-cfg.gmres_maxiter_linear // cfg.gmres_segment_its)
        for _ in range(n_segs):
            x, okd, itd, _ = self._lin_seg_jit(
                x, b_hat, tol, diag, nbinv, u_star, tb, dt_att, th, fe, pops
            )
            # One stacked pull per segment (segments are seconds-long at
            # the scales that select this driver).
            vals = np.asarray(
                jnp.stack([okd.astype(jnp.float32), itd.astype(jnp.float32)])
            )
            total += int(vals[1])
            if bool(vals[0]):
                ok = True
                break
        return self._lin_fin_jit(
            state, kc, x, jnp.asarray(ok), jnp.asarray(total, jnp.int32),
            fe, pops,
        )

    def _pull_metrics(self, m: StepMetrics) -> StepMetrics:
        """ALL step metrics in ONE device->host transfer (python scalars).

        Every separate pull is a full round-trip over the (possibly remote)
        device link (~30-40 ms on the axon tunnel); the ladder's convergence
        check and the driver's logging share this single stacked read.
        """
        f32 = jnp.float32
        vals = np.asarray(
            jnp.stack(
                [
                    m.time.astype(f32), m.drag.astype(f32), m.lift.astype(f32),
                    m.delta_p.astype(f32), m.gmres_iters.astype(f32),
                    m.newton_iters.astype(f32), m.converged.astype(f32),
                    m.residual.astype(f32), m.dt_used.astype(f32),
                ]
            )
        )
        return StepMetrics(
            time=float(vals[0]), drag=float(vals[1]), lift=float(vals[2]),
            delta_p=float(vals[3]), gmres_iters=int(vals[4]),
            newton_iters=int(vals[5]), converged=bool(vals[6]),
            residual=float(vals[7]), dt_used=float(vals[8]),
        )

    def step(self, state: State) -> tuple[State, StepMetrics]:
        """One time step; returned metrics are host scalars (one pull).

        Linearized path: the ladder's retry decisions run on the host (one
        cheap sync per step) with a single compiled attempt program — large
        jitted while(solve) programs fault some TPU compilers.  Newton path:
        fully jitted.
        """
        if self.cfg.nonlinear_method == NonlinearMethod.NEWTON:
            if self._newton_host:
                return self._newton_host_step(state)
            new_state, m = self._step_jit(state, self.fe, self.pressure_ops)
            return new_state, self._pull_metrics(m)
        its_prev = 0
        for k in range(self._n_trials):
            if self._linear_host:
                new_state, m = self._attempt_host(state, k)
            else:
                new_state, m = self._attempt_jit(
                    state, self._k_consts[k], self.fe, self.pressure_ops
                )
            # Happy path costs exactly ONE device->host transfer.
            m = self._pull_metrics(m)
            if m.converged or k == self._n_trials - 1:
                break
            its_prev += m.gmres_iters
        if its_prev:
            m = dataclasses.replace(m, gmres_iters=its_prev + m.gmres_iters)
        return new_state, m

    # ------------------------------------------------------------------
    def n_steps(self) -> int:
        return int(round(self.cfg.T / self.dt0))

    def run(
        self,
        n_steps: Optional[int] = None,
        state: Optional[State] = None,
        on_step: Optional[Callable] = None,
        logger=None,
    ):
        """Python-loop driver (per-step host I/O), mirroring run() cpp:1044."""
        state = state if state is not None else self.initial_state()
        # The jitted step donates its input buffers; copy once so the
        # caller's state object stays valid after this run.
        state = jax.tree.map(lambda a: jnp.array(a, copy=True), state)
        n = n_steps if n_steps is not None else self.n_steps()
        history = []
        step_no = int(state.step)
        frozen_streak = 0
        frozen_warned = False
        for _ in range(n):
            t0 = _time.perf_counter()
            # step() already pulled every metric in ONE stacked transfer.
            state, m = self.step(state)
            wall = _time.perf_counter() - t0
            step_no += 1
            rec = {
                "step": step_no,
                "time": m.time,
                "Cd": m.drag,
                "Cl": m.lift,
                "DeltaP": m.delta_p,
                "gmres_iters": m.gmres_iters,
                "newton_iters": m.newton_iters,
                "converged": m.converged,
                "wall": wall,
            }
            # Instantaneous Re for sin(pi t/8)-modulated inlets
            # (reference: NavierStokes.cpp:1089-1111).
            import math as _math

            t_now = rec["time"]
            u_peak = self.cfg.U_m * _math.sin(_math.pi * t_now / 8.0)
            if self.cfg.inlet_time_modulated:
                from ..config import mean_velocity_factor as _mvf

                u_mean = _mvf(self.cfg.dim) * u_peak
                rec["re_instant"] = u_mean * 0.1 / self.nu
            # Freeze guard: with warm starts, consecutive 0-iteration solves
            # mean the previous solution already satisfies rtol*||b|| and
            # the trajectory is coasting — legitimate at a converged steady
            # state, but at large n_dofs it can silently accumulate O(1)
            # solution error (measured on mesh-3D-xfine: spurious Cd
            # plateau 6.69 vs ~2.9; docs/DESIGN.md "accuracy cliff").
            if (
                self.cfg.nonlinear_method != NonlinearMethod.NEWTON
                and self.cfg.gmres_warm_start
                and self._gmres_criterion == "rhs"  # defect cannot freeze
            ):
                frozen_streak = frozen_streak + 1 if rec["gmres_iters"] == 0 else 0
                if frozen_streak >= 5 and not frozen_warned:
                    frozen_warned = True
                    print(
                        f"WARNING: {frozen_streak} consecutive 0-iteration "
                        "steps — the warm start satisfies gmres_rtol*||b|| "
                        "and the state is frozen.  If the flow is not at a "
                        "converged steady state, the trace is coasting on "
                        "tolerance error: tighten --rtol or use "
                        "--no-warm-start (see docs/DESIGN.md accuracy "
                        "cliff).",
                        flush=True,
                    )
            history.append(rec)
            if logger is not None:
                logger.log_step(rec)
            if on_step is not None:
                on_step(state, rec)
        return state, history

    def run_steady_continuation(
        self,
        state: Optional[State] = None,
        on_step: Optional[Callable] = None,
        logger=None,
        max_steps: Optional[int] = None,
    ):
        """Pseudo-transient Δt continuation to the steady state (SER-style).

        The reference solves its steady cases (2D-1, 3D-1Z) by marching a
        fixed dt=0.1 BE ladder for T/dt steps (NavierStokes.cpp:1044-1076
        — the steady run IS a long transient there).  This driver reaches
        the same fixed point in ~log2(dt_max/dt0) steps: every converged
        Newton step multiplies dt by ``cfg.continuation_growth`` (capped at
        ``cfg.continuation_dt_max``), so the BE step x^{n+1} solves
        (x - x^n)/dt + N(x) = 0 with 1/dt -> 0 — approaching the pure
        steady Newton solve while the shrinking mass term keeps the early,
        far-from-steady iterations globalized (classical pseudo-transient
        continuation; the CC Schur preconditioner tracks dt through
        StepParams automatically).  A non-converged step halves dt and
        retries from the same state, mirroring the transient dt ladder.

        Stops when the dt-normalized rate ||x^{n+1}-x^n||/(dt ||x^{n+1}||)
        (a discrete relative ||du/dt||) drops below
        ``cfg.continuation_steady_tol``.  Newton-method cases only; uses
        the host Newton driver regardless of config.newton_driver (the
        growing dt is passed as a device scalar so every rung of the
        ladder reuses one compiled program set).
        """
        cfg = self.cfg
        if cfg.nonlinear_method != NonlinearMethod.NEWTON:
            raise NotImplementedError(
                "steady continuation requires the Newton nonlinear method "
                "(the linearized ladder has no per-step convergence control "
                "at large dt)"
            )
        if not cfg.steady_continuation:
            # Programmatic entry without the config flag: running THIS
            # driver means the config semantically is a continuation run —
            # set the flag so regime-sensitive autos (schur_gd_mass=None)
            # resolve for the large-dt ladder.
            self.cfg = cfg = dataclasses.replace(cfg, steady_continuation=True)
        state = state if state is not None else self.initial_state()
        state = jax.tree.map(lambda a: jnp.array(a, copy=True), state)
        dt = float(self.dt0)
        dt_min = float(self.dt0)
        n_max = max_steps if max_steps is not None else cfg.continuation_max_steps
        history = []
        step_no = int(state.step)
        retries = 0
        for _ in range(n_max):
            t0 = _time.perf_counter()
            new_state, m = self._newton_host_step(
                state, dt=jnp.asarray(dt, self.dtype)
            )
            if not m.converged and dt > dt_min * (1 + 1e-9) and retries < 8:
                # Reject: the big step left Newton's basin — halve and
                # retry from the SAME state (transient-ladder semantics).
                dt = max(dt_min, 0.5 * dt)
                retries += 1
                continue
            rate = float(
                self._steady_rate_jit(
                    new_state.x_old, state.x_old, jnp.asarray(dt, self.dtype)
                )
            )
            wall = _time.perf_counter() - t0
            state = new_state
            step_no += 1
            rec = {
                "step": step_no,
                "time": m.time,
                "Cd": m.drag,
                "Cl": m.lift,
                "DeltaP": m.delta_p,
                "gmres_iters": m.gmres_iters,
                "newton_iters": m.newton_iters,
                "converged": m.converged,
                "wall": wall,
                "dt": dt,
                "steady_rate": rate,
            }
            history.append(rec)
            if logger is not None:
                logger.log_step(rec)
            if on_step is not None:
                on_step(state, rec)
            if m.converged and rate < cfg.continuation_steady_tol:
                break
            if m.converged:
                dt = min(cfg.continuation_dt_max, dt * cfg.continuation_growth)
                retries = 0
        return state, history

    def run_async(self, n_steps: int, state: Optional[State] = None, window: int = 1):
        """Optimistically pipelined stepping: ``window`` nominal-dt attempts
        are dispatched without host synchronization, then all their
        convergence flags are read in ONE device->host transfer (each pull
        pays a full round-trip over the device link).  On the rare
        non-converged attempt, the run rewinds to the last good state and
        replays that step through the full host-side retry ladder —
        identical accepted-state sequence to the per-step loop.

        Returns (final_state, metrics_of_last_step).

        With the single-stacked-pull metrics read, window=8 measures ~14%
        FASTER than per-step synchronous pulls on the axon-tunneled TPU
        (197 -> 172 ms/step on mesh-2D-100 developed flow; bench.py uses
        window=48, the round-4 plateau).  Default stays window=1 for
        exact per-step logging.
        """
        state = state if state is not None else self.initial_state()
        state = jax.tree.map(lambda a: jnp.array(a, copy=True), state)
        if self.cfg.nonlinear_method == NonlinearMethod.NEWTON:
            if self._newton_host:
                m = None
                for _ in range(n_steps):
                    state, m = self.step(state)
                return state, m
            # Fully jitted step: dispatch all n steps with ZERO per-step
            # pulls (the in-graph damping loop needs no host decisions),
            # then pull the last step's metrics once.
            m = None
            for _ in range(n_steps):
                state, m = self._step_jit(state, self.fe, self.pressure_ops)
            return state, (self._pull_metrics(m) if m is not None else m)
        if window <= 1 or self._linear_host:
            # The host-segmented driver already syncs per segment, so the
            # windowed optimistic dispatch has nothing to pipeline.
            m = None
            for _ in range(n_steps):
                state, m = self.step(state)
            return state, m

        import numpy as _np

        m_last = None
        done = 0
        frozen_streak = 0
        frozen_warned = False
        while done < n_steps:
            w = min(window, n_steps - done)
            saved = []
            metrics = []
            st = state
            for _ in range(w):
                saved.append(st)
                st, m = self._attempt_jit(st, self._k_consts[0], self.fe, self.pressure_ops)
                metrics.append(m)
            # ONE stacked pull for flags + iteration counts (each separate
            # D2H transfer costs a full ~30-40 ms round-trip).
            packed = _np.asarray(
                jnp.stack(
                    [
                        jnp.stack([m.converged.astype(jnp.float32) for m in metrics]),
                        jnp.stack([m.gmres_iters.astype(jnp.float32) for m in metrics]),
                    ]
                )
            )
            flags = packed[0] > 0.5
            # Freeze guard (same rationale as run(): docs/DESIGN.md
            # "accuracy cliff") on the windowed path used by long runs.
            # Newton runs return above, but keep the exclusion explicit in
            # case the windowed path ever grows a Newton branch: Newton's
            # zero-guess inner solves legitimately hit 0 iterations near a
            # steady state and the warning's advice would not apply.
            if (
                self.cfg.nonlinear_method != NonlinearMethod.NEWTON
                and self.cfg.gmres_warm_start
                and self._gmres_criterion == "rhs"  # defect cannot freeze
                and not frozen_warned
            ):
                for it_count in packed[1]:
                    frozen_streak = frozen_streak + 1 if it_count == 0 else 0
                    if frozen_streak >= 5:
                        frozen_warned = True
                        print(
                            f"WARNING: {frozen_streak} consecutive "
                            "0-iteration steps — the warm start satisfies "
                            "gmres_rtol*||b|| and the state is frozen.  If "
                            "the flow is not at a converged steady state, "
                            "tighten --rtol or use --criterion defect (see "
                            "docs/DESIGN.md accuracy cliff).",
                            flush=True,
                        )
                        break
            if flags.all():
                state, m_last = st, metrics[-1]
                done += w
            else:
                j = int(_np.argmax(~flags))  # first failed attempt
                state = saved[j]
                done += j
                state, m_last = self.step(state)  # full retry ladder
                done += 1
        return state, m_last

    def run_scan(self, n_steps: int, state: Optional[State] = None):
        """lax.scan time loop (single compiled program for the whole run).

        NOTE: some TPU toolchains compile scan-of-large-bodies very slowly;
        ``run_async`` gives the same throughput via async dispatch and
        compiles the step only once.
        """
        state = state if state is not None else self.initial_state()

        @jax.jit
        def loop(s, fe, pops):
            def body(c, _):
                s2, m = self._step(c, fe, pops)
                return s2, m

            return jax.lax.scan(body, s, None, length=n_steps)

        final_state, metrics = loop(state, self.fe, self.pressure_ops)
        return final_state, metrics
