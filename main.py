#!/usr/bin/env python3
"""CLI entry point for the TPU-native Navier-Stokes engine.

Replaces the reference's compile-time test selection (reference:
src/main.cpp:13-22, where cases are chosen by commenting lines and
recompiling) with runtime flags.  Produces the same artifacts: console log,
``forces.txt``, and per-interval VTU/PVD output — plus checkpoints.

Examples:
  python main.py --case 2D-2 --mesh /root/reference/meshes/mesh-2D.msh --deltat 0.01
  python main.py --case 3D-2Z --mesh meshes/mesh-3D-5.msh --vtu-every 25
  python main.py --case 2D-1 --steps 50 --dtype float64 --platform cpu
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--case", default="2D-2", help="test case: 2D-1, 2D-2, 2D-3, 3D-1Z, 3D-2Z, 3D-3Z")
    p.add_argument(
        "--mesh",
        default="/root/reference/meshes/mesh-2D.msh",
        help=".msh path, or a native-generator spec: gen2d[:h_far[,h_cyl]] / "
        "gen3d[:h_far[,h_cyl]] (channel-past-cylinder meshes, mesh/generators.py)",
    )
    p.add_argument("--deltat", type=float, default=-1.0, help="time step (<=0: Re-based default)")
    p.add_argument("--T", type=float, default=None, help="final time override")
    p.add_argument("--steps", type=int, default=None, help="run exactly N steps instead of T/dt")
    p.add_argument("--dtype", default="float32", choices=["float32", "float64"])
    p.add_argument("--platform", default=None, help="force jax platform (cpu, tpu)")
    p.add_argument("--output-dir", default=".", help="where forces.txt / VTU / checkpoints go")
    p.add_argument("--vtu-every", type=int, default=0, help="write VTU every N steps (0 = off)")
    p.add_argument("--checkpoint-every", type=int, default=0, help="write checkpoint every N steps (0 = off)")
    p.add_argument("--resume", default=None, help="resume from checkpoint file")
    p.add_argument("--rtol", type=float, default=None, help="GMRES stopping tolerance override")
    p.add_argument("--no-warm-start", action="store_true", help="zero GMRES initial guess (reference behavior)")
    p.add_argument(
        "--warm-start-mode", default=None, choices=["previous", "extrap_u"],
        help="linearized warm-start predictor (config.gmres_warm_start_mode)",
    )
    p.add_argument("--quiet", action="store_true")
    p.add_argument(
        "--profile-dir",
        default=None,
        help="wrap the run in a jax.profiler device trace (view in TensorBoard)",
    )
    p.add_argument(
        "--vel-precond",
        default=None,
        choices=["jacobi", "chebyshev", "nodeblock", "p1coarse", "p1coarse_mult"],
        help="velocity-block preconditioner override",
    )
    p.add_argument(
        "--p1-iters", type=int, default=None,
        help="coarse PCG budget for --vel-precond p1coarse*",
    )
    p.add_argument(
        "--schur", default=None, choices=["cc", "pcd"],
        help="Schur approximation: Cahouet-Chabard or pressure convection-diffusion",
    )
    p.add_argument(
        "--precond-structure", default=None, choices=["triangular", "diagonal"],
        help="block preconditioner structure (reference PreconditionBlockTriangular"
        " / PreconditionBlockDiagonal, NavierStokes.hpp:242-366)",
    )
    p.add_argument(
        "--criterion", default=None, choices=["auto", "rhs", "defect"],
        help="GMRES stopping normalization (config.gmres_criterion)",
    )
    p.add_argument(
        "--defect-floor", type=float, default=None,
        help="absolute floor of the defect criterion as a fraction of"
        " ||b|| (config.gmres_defect_floor)",
    )
    p.add_argument(
        "--linear-driver", default=None, choices=["auto", "fused", "host"],
        help="linearized-path Krylov driver: fused in-program FGMRES or"
        " host-segmented bounded device calls (config.linear_driver;"
        " auto switches to host above 400k dofs)",
    )
    p.add_argument(
        "--gmres-dots", default=None, choices=["plain", "chunked"],
        help="Krylov inner-product evaluation: plain or two-level chunked"
        " f32 accumulation (config.gmres_dots; single-chip layouts)",
    )
    p.add_argument(
        "--kp-iters", type=int, default=None,
        help="CG/smoother budget of the K_p Schur solve (config.precond_kp_iters)",
    )
    p.add_argument(
        "--newton-forcing", default=None, choices=["fixed", "ew"],
        help="inner-tolerance forcing for Newton solves: fixed"
        " gmres_rtol_newton (reference behavior) or Eisenstat-Walker"
        " choice 2 (config.newton_forcing)",
    )
    p.add_argument(
        "--newton-reuse", type=int, default=None,
        help="rebuild the Newton Jacobian/preconditioner only every k-th"
        " iteration (modified Newton; tile path only — the residual and"
        " stopping test stay exact; config.newton_jacobian_reuse)",
    )
    p.add_argument(
        "--schur-dense-max", type=int, default=None,
        help="pressure-space size up to which K_p^{-1} is a precomputed dense"
        " inverse; above it the aggregation two-grid is used"
        " (config.precond_schur_dense_max; 0 forces the two-grid)",
    )
    p.add_argument(
        "--twolevel-cycles", type=int, default=None,
        help="V-cycles of the aggregation two-grid Schur (config.precond_twolevel_cycles)",
    )
    p.add_argument(
        "--operator-path", default=None,
        choices=["quadrature", "tile", "element"],
        help="Krylov operator evaluation (config.operator_path)",
    )
    p.add_argument(
        "--tile-elements", type=int, default=None,
        help="elements per tile on the tile operator path (config.tile_elements)",
    )
    p.add_argument(
        "--kp-storage", default=None, choices=["f32", "f16", "bf16x2"],
        help="storage of the dense K_p^{-1} (config.kp_inv_storage)",
    )
    p.add_argument(
        "--schur-gd-mass", default=None, choices=["on", "off", "auto"],
        help="grad-div-aware Schur mass term, nu -> nu+gamma "
        "(config.schur_gd_mass; default auto = on under "
        "--steady-continuation, off on fixed-dt marches)",
    )
    p.add_argument(
        "--layout",
        default="replicated",
        choices=["replicated", "halo"],
        help="multi-device layout: replicated DoF vectors (element-axis SPMD) "
        "or the halo-exchange owned-node decomposition (O(interface) comm)",
    )
    p.add_argument(
        "--shards",
        type=int,
        default=0,
        help="device count for --layout halo (0 = all visible devices)",
    )
    p.add_argument(
        "--steady-continuation",
        action="store_true",
        help="pseudo-transient dt continuation for steady cases: grow dt "
        "geometrically after every converged Newton step instead of "
        "marching T/dt fixed steps (config.steady_continuation)",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        os.environ.setdefault("JAX_PLATFORMS", args.platform)
    import jax

    from navier_stokes_equations_tpu.utils.platform import configure

    configure()  # compile cache + full-precision f32 matmuls (see platform.py)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    from navier_stokes_equations_tpu.models import solver, test_cases
    from navier_stokes_equations_tpu.utils import checkpoint as ckpt
    from navier_stokes_equations_tpu.utils import logging as nslog
    from navier_stokes_equations_tpu.utils import vtu

    cfg = test_cases.make(args.case, deltat=args.deltat)
    over = {"dtype": args.dtype}
    if args.T is not None:
        over["T"] = args.T
    if args.rtol is not None:
        over["gmres_rtol"] = args.rtol
    if args.no_warm_start:
        over["gmres_warm_start"] = False
    if args.warm_start_mode:
        over["gmres_warm_start_mode"] = args.warm_start_mode
    if args.vel_precond:
        over["precond_vel_method"] = args.vel_precond
    if args.p1_iters is not None:
        over["precond_p1_iters"] = args.p1_iters
    if args.schur:
        over["precond_schur"] = args.schur
    if args.precond_structure:
        over["precond_structure"] = args.precond_structure
    if args.criterion:
        over["gmres_criterion"] = args.criterion
    if args.gmres_dots:
        over["gmres_dots"] = args.gmres_dots
    if args.linear_driver:
        over["linear_driver"] = args.linear_driver
    if args.defect_floor is not None:
        over["gmres_defect_floor"] = args.defect_floor
    if args.kp_iters is not None:
        over["precond_kp_iters"] = args.kp_iters
    if args.schur_dense_max is not None:
        over["precond_schur_dense_max"] = args.schur_dense_max
    if args.newton_forcing:
        over["newton_forcing"] = args.newton_forcing
    if args.newton_reuse is not None:
        over["newton_jacobian_reuse"] = args.newton_reuse
    if args.twolevel_cycles is not None:
        over["precond_twolevel_cycles"] = args.twolevel_cycles
    if args.operator_path:
        over["operator_path"] = args.operator_path
    if args.tile_elements is not None:
        over["tile_elements"] = args.tile_elements
    if args.kp_storage:
        over["kp_inv_storage"] = args.kp_storage
    if args.schur_gd_mass is not None:
        over["schur_gd_mass"] = {"on": True, "off": False, "auto": None}[
            args.schur_gd_mass]
    if args.steady_continuation:
        over["steady_continuation"] = True
    cfg = dataclasses.replace(cfg, **over)

    os.makedirs(args.output_dir, exist_ok=True)
    mesh = args.mesh
    if mesh.startswith(("gen2d", "gen3d")):
        from navier_stokes_equations_tpu.mesh import generators, taylor_hood

        kind, _, params = mesh.partition(":")
        sizes = [float(x) for x in params.split(",") if x] if params else []
        gen = generators.channel_cylinder_2d if kind == "gen2d" else generators.channel_cylinder_3d
        mesh = taylor_hood.build(gen(*sizes))
    if args.layout == "halo":
        from navier_stokes_equations_tpu.parallel import halo_solver

        n_shards = args.shards if args.shards > 0 else len(jax.devices())
        s = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=n_shards)
    else:
        s = solver.NavierStokesSolver(cfg, mesh)

    logger = nslog.RunLogger(
        forces_path=os.path.join(args.output_dir, "forces.txt"),
        verbose=not args.quiet,
    )
    logger.log_setup(s)

    halo = args.layout == "halo"
    if args.resume:
        state, _ = ckpt.load(args.resume, dtype=s.dtype)
        print(f"Resumed from {args.resume} at step {int(state.step)}, t={float(state.time):g}")
        if halo:
            # Checkpoints are layout-independent (global vectors).
            state = s.from_global_state(state)
    else:
        state = s.initial_state()

    pvd_entries = []

    def write_vtu_state(st, step, t):
        import numpy as np

        u, p = s.fe.split(s.global_solution(st) if halo else st.x_old)
        name = f"solution_{step:06d}.vtu"
        vtu.write_vtu(os.path.join(args.output_dir, name), s.mesh, np.asarray(u), np.asarray(p))
        pvd_entries.append((t, name))
        vtu.write_pvd(os.path.join(args.output_dir, "solution.pvd"), pvd_entries)

    if args.vtu_every and not args.resume:
        # Initial-state output before the time loop (reference writes
        # output(0), NavierStokes.cpp:1071).
        write_vtu_state(state, int(state.step), float(state.time))

    def on_step(st, rec):
        step = rec["step"]
        if args.vtu_every and step % args.vtu_every == 0:
            write_vtu_state(st, step, rec["time"])
        if args.checkpoint_every and step % args.checkpoint_every == 0:
            ckpt.save(
                os.path.join(args.output_dir, "checkpoint.npz"),
                s.to_global_state(st) if halo else st,
            )

    n = args.steps if args.steps is not None else max(0, s.n_steps() - int(state.step))

    def drive():
        if cfg.steady_continuation:
            return s.run_steady_continuation(
                state=state, on_step=on_step, logger=logger,
                max_steps=args.steps,
            )
        return s.run(n_steps=n, state=state, on_step=on_step, logger=logger)

    if args.profile_dir:
        from navier_stokes_equations_tpu.utils import timing

        with timing.trace(args.profile_dir):
            state, hist = drive()
    else:
        state, hist = drive()
    if args.checkpoint_every:
        # Always leave an end-of-run checkpoint so segmented drivers
        # (scripts/validate.py) can resume regardless of step alignment.
        ckpt.save(
            os.path.join(args.output_dir, "checkpoint.npz"),
            s.to_global_state(state) if halo else state,
        )
    logger.close()
    if not args.quiet:
        print("===============================================")
        print("Simulation complete.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
