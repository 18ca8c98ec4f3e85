"""Declarative solver configuration.

Replaces the reference's three-level config (compile-time test selection in
main.cpp:13-22, factory defaults in TestCases.hpp:93-96, hard-coded constants
in NavierStokes.hpp:514-521 / NavierStokes.cpp:545,836) with one runtime
dataclass.  The six named presets live in ``models/test_cases.py``.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Optional

import numpy as np


class TimeScheme(enum.Enum):
    BACKWARD_EULER = "backward_euler"
    CRANK_NICOLSON = "crank_nicolson"


class NonlinearMethod(enum.Enum):
    NEWTON = "newton"
    LINEARIZED = "linearized"


def compute_default_deltat(Re: float) -> float:
    """Re-based default time step (reference: NavierStokes.hpp:368-375)."""
    if Re <= 20:
        return 0.1
    if Re <= 50:
        return 0.05
    if Re <= 100:
        return 0.02
    if Re <= 150:
        return 0.01
    return 0.005


# Physical / geometric constants (reference: NavierStokes.hpp:490-497).
RHO = 1.0
CYLINDER_D = 0.1
CHANNEL_H = 0.41

# Dof count above which gmres_criterion="auto" selects the "defect"
# stopping normalization.  Rationale (docs/DESIGN.md "accuracy cliff"):
# a fixed rtol*||b|| acceptance admits solution error ~||A^-1||*rtol*||b||,
# and ||A^-1|| grows ~1/h^2 with refinement at fixed dt — measured O(1)
# physics error (frozen warm starts, spurious Cd plateau 6.69) at 1.36M
# dofs, and ~1% corridor misses already visible at 580k.  Every regime
# validated with "rhs" (bench mesh-2D-100 at 160k dofs and below) sits
# under this threshold.
GMRES_CRITERION_AUTO_DOFS = 500_000


def resolve_gmres_criterion(criterion: str, n_dofs: int) -> str:
    """Resolve gmres_criterion="auto" by total dof count (see above)."""
    if criterion == "auto":
        return "defect" if n_dofs > GMRES_CRITERION_AUTO_DOFS else "rhs"
    if criterion not in ("rhs", "defect"):
        raise ValueError(f"unknown gmres_criterion {criterion!r}")
    return criterion


def mean_velocity_factor(dim: int) -> float:
    """U_mean = factor * U_m (reference: NavierStokes.cpp:64-70, 990-994)."""
    return 2.0 / 3.0 if dim == 2 else 4.0 / 9.0


@dataclasses.dataclass
class SolverConfig:
    """Everything the solver needs beyond the mesh.

    ``inlet_profile(coords, t)`` maps boundary-node coordinates (n, dim) and a
    (traced) time scalar to velocity values (n, dim); it must be jax-traceable.
    ``forcing`` maps quadrature-point coordinates (..., dim) and time to a
    body force (..., dim); ``None`` means identically zero (all reference
    cases; the term is then dropped from the compiled graph).
    """

    name: str = "custom"
    description: str = ""
    dim: int = 2
    Re: float = 100.0
    U_m: float = 1.5
    T: float = 8.0
    deltat: float = -1.0  # <= 0: Re-based default
    time_scheme: TimeScheme = TimeScheme.CRANK_NICOLSON
    nonlinear_method: NonlinearMethod = NonlinearMethod.LINEARIZED
    use_supg: bool = False
    grad_div_gamma: float = 0.1  # reference: NavierStokes.cpp:463,793

    inlet_profile: Optional[Callable] = None
    # True when the inlet carries the sin(pi t/8) modulation — drives the
    # instantaneous-Re console line (reference: NavierStokes.cpp:1089-1111).
    inlet_time_modulated: bool = False
    forcing: Optional[Callable] = None
    initial_condition: Optional[Callable] = None  # coords -> (n, dim+1) or None

    # Solver budgets (reference: NavierStokes.cpp:545,554-555,836; hpp:514-515)
    gmres_maxiter_newton: int = 500
    gmres_maxiter_linear: int = 200
    gmres_restart: int = 150
    # Allocated Krylov basis length (HBM traffic of the CGS2 projections
    # scales with the allocation, not the live iteration count).  Solves
    # exceeding it restart there; warm-started benchmark steps use ~15.
    gmres_alloc: int = 64
    # Absolute stopping criterion ||r|| <= gmres_rtol * ||b||.  The reference
    # uses 1e-2 with a zero initial guess (cpp:545, 836); with warm starting
    # that criterion is met almost immediately and suppresses the unsteady
    # dynamics, so the default here is tighter.  Validated on 2D-2: 1e-4
    # reproduces the DFG shedding (St=0.294 on the coarse mesh) while 1e-2 +
    # warm start locks onto a spurious steady state.
    gmres_rtol: float = 1e-4
    # Stopping normalization for the linearized path: "rhs" (||r|| <=
    # rtol*||b||, validated at bench scale) or "defect" (||r|| <=
    # max(rtol*||b - A x0||, 1e-6*||b||) — the reference's SolverControl
    # semantics under warm starting; demands a genuine per-step reduction
    # so the acceptance tightens as the flow settles instead of freezing.
    # Required for trustworthy >1M-dof traces (docs/DESIGN.md "accuracy
    # cliff"); costs more iterations per step.  "auto" (default) resolves
    # at solver construction: "defect" above GMRES_CRITERION_AUTO_DOFS
    # total dofs, "rhs" below — mirroring newton_driver="auto", so a
    # default-config fine-mesh run can NEVER freeze into tolerance-error
    # coasting (the measured mesh-3D-xfine failure mode), while the
    # validated bench regime keeps its cheaper criterion.
    gmres_criterion: str = "auto"
    # Inner-product evaluation: "plain" (validated trajectories) or
    # "chunked" (two-level f32 accumulation — cuts the MXU sequential
    # K-tile roundoff ~5x at zero cost; candidate cure for the ~1.6x
    # f32 iteration overhead at rtol<=1e-5, measure before adopting).
    gmres_dots: str = "plain"
    # Linearized-path Krylov driver: "fused" runs the whole FGMRES inside
    # the jitted attempt program (fast dispatch; device-call length grows
    # with the iteration count), "host" splits the solve into
    # gmres_segment_its-iteration jitted segments with a host loop between
    # them, bounding every device call — the TPU worker KILLS programs
    # that run minutes (observed: the 1.36M-dof defect-criterion attempt),
    # the same failure newton_driver="host" guards against.  "auto"
    # selects "host" above 400k dofs (every validated fused regime sits
    # below; the segment restart at gmres_segment_its only alters
    # trajectories that exceed it, which at that scale are exactly the
    # watchdog-risk solves).
    linear_driver: str = "auto"
    gmres_segment_its: int = 48
    # Absolute floor of the defect criterion, as a fraction of ||b||:
    # tol = max(rtol * ||b - A x0||, gmres_defect_floor * ||b||).  The
    # floor keeps a near-perfect warm start from demanding a reduction
    # below the f32 residual-evaluation noise — but it is also the
    # BINDING constraint whenever rtol*defect < floor*||b|| (measured on
    # mesh-3D-xfine: the entire inlet ramp runs ~170 its/step against
    # the 1e-6 floor regardless of rtol).  Raise it at scale to trade
    # per-step backward error (floor*||b||) for iterations.
    gmres_defect_floor: float = 1e-6
    # Newton's inner linear solves stay at the reference's loose tolerance
    # (inexact Newton: the outer iteration controls accuracy, cpp:545).
    gmres_rtol_newton: float = 1e-2
    # Inner-tolerance forcing strategy: "fixed" (gmres_rtol_newton every
    # iteration — the reference's behavior) or "ew" (Eisenstat-Walker
    # choice 2: eta_k = gamma (||F_k||/||F_{k-1}||)^alpha with the
    # eta_{k-1}-safeguard and an oversolving floor 0.5*tol/||F_k|| — far
    # from the root the Jacobian is a poor model, so a loose solve buys
    # the same outer progress for fewer Krylov iterations).
    newton_forcing: str = "fixed"  # "fixed" | "ew"
    newton_forcing_eta_max: float = 0.5
    newton_forcing_eta_min: float = 1e-4
    newton_forcing_gamma: float = 0.9
    newton_forcing_alpha: float = 2.0
    # Rebuild the Newton Jacobian (and the preconditioner built from it)
    # only every k-th iteration; the residual/RHS is always fresh, so the
    # outer stopping test is exact and only the CONVERGENCE RATE degrades
    # (modified Newton).  Pays off on the tile operator path, where the
    # per-iteration block assembly + tile reduction dominates and the
    # Krylov applications are cheap; a no-op on the quadrature path (the
    # matfree apply re-derives the weak form per application regardless).
    # The reference re-assembles every iteration (NavierStokes.cpp:1152).
    newton_jacobian_reuse: int = 1
    newton_max_iterations: int = 50
    newton_tolerance: float = 1e-8
    # A 3-iteration residual stall exits the Newton loop (the damping ladder
    # is cycling, cpp:1163-1169) but only reports converged=True when the
    # residual sits within this factor of the estimated assembly roundoff
    # floor eps * || sum_e |b_e| || (see solver._newton_residual_system);
    # a genuinely diverging Newton (bad preconditioner, bad config) reports
    # honest non-convergence like the reference (cpp:1155-1169).
    newton_stall_floor_factor: float = 64.0
    # Relative fallback ||R|| <= newton_rtol * ||R_first||: the reference's
    # absolute 1e-8 (NavierStokes.hpp:514-515) presumes f64 residuals; in
    # f32 at ~1e5 dofs the attainable floor is ~1e-6 relative, and without
    # this criterion every step burns all 50 iterations.
    newton_rtol: float = 1e-6
    max_substeps: int = 4  # dt-halving retries (reference: NavierStokes.cpp:1211)
    # Pseudo-transient Δt continuation for the STEADY cases (2D-1, 3D-1Z).
    # The reference marches them with a fixed dt=0.1 BE ladder until the
    # flow stops changing (its steady runs are simply long transients,
    # NavierStokes.cpp:1044-1076); continuation instead GROWS dt
    # geometrically after every converged step (SER-style: large dt makes
    # the BE step approach the pure steady Newton solve), so the march
    # reaches the same fixed point in ~log2(dt_max/dt0) steps instead of
    # T/dt0.  Newton + host driver only (solver.run_steady_continuation);
    # a failed step halves dt and retries, exactly like the ladder.
    steady_continuation: bool = False
    continuation_growth: float = 2.0  # dt multiplier per converged step
    continuation_dt_max: float = 51.2  # dt cap (dt0 * 2^9 at dt0=0.1)
    # Stop when the dt-normalized state rate ||x^{n+1}-x^n|| / (dt ||x^{n+1}||)
    # falls below this (a discrete ||du/dt|| / ||u||); rate-based so the
    # test is dt-invariant across the continuation ladder.
    continuation_steady_tol: float = 1e-5
    continuation_max_steps: int = 60
    # Warm-start GMRES from the previous time level (the reference starts
    # from zero, cpp:849/560; warm starting converges to the same tolerance
    # in fewer iterations and is the TPU default).
    gmres_warm_start: bool = True
    # Warm-start predictor (linearized path): "previous" starts from x^n;
    # "extrap_u" extrapolates the VELOCITY to 2u^n - u^{n-1} (the same
    # clamped extrapolation as the Oseen advection field u*) while holding
    # the pressure at p^n.  Full-state linear extrapolation was measured
    # WORSE (13 -> 33 its/step on 2D-2: the CN pressure mode is non-smooth
    # step-to-step and extrapolating it amplifies it); velocity-only keeps
    # the smooth part.  Ignored when gmres_warm_start=False.
    gmres_warm_start_mode: str = "previous"  # "previous" | "extrap_u"

    # Preconditioner knobs (TPU-native substitutes for ILU/AMG).
    # velocity block: "jacobi" | "chebyshev" | "nodeblock" | "p1coarse"
    # (additive p-multigrid: Jacobi fine sweep + PCG-solved P1-vertex coarse
    # correction) | "p1coarse_mult" (multiplicative variant, one extra
    # velocity-block application).
    precond_vel_method: str = "jacobi"
    precond_vel_degree: int = 6  # Chebyshev polynomial degree (velocity block)
    precond_vel_sweeps: int = 1  # Jacobi sweeps when vel_method="jacobi"
    precond_p1_iters: int = 8  # coarse PCG budget for vel_method="p1coarse*"
    # Newton driver: the fully-jitted while_loop packs the WHOLE step
    # (<=50 Newton iterations x <=500-iteration solves) into one device
    # program — on large meshes a single call can run for minutes, which
    # the (axon) TPU worker kills as a fault.  "host" drives the damping
    # loop from the host with one jitted call per assembly/solve (exactly
    # the reference's structure, NavierStokes.cpp:1144-1201; one ~35 ms
    # metrics pull per Newton iteration — negligible at that scale).
    # "auto": host loop for n_dofs > 200k, in-graph otherwise.
    newton_driver: str = "auto"  # "auto" | "graph" | "host"
    # Schur approximation: "cc" (Cahouet-Chabard, the reference's structure,
    # NavierStokes.hpp:279-366) or "pcd" (pressure convection-diffusion —
    # adds the pressure-space advection term N_p(u*) to the Schur action,
    # the ESW recipe for convection-dominated regimes).
    precond_schur: str = "cc"
    # Block structure: "triangular" (the reference's default-and-actually-used
    # PreconditionBlockTriangular, NavierStokes.hpp:279-366: velocity solve,
    # then Schur action on r_p - B z_u) or "diagonal" (the reference's
    # PreconditionBlockDiagonal, NavierStokes.hpp:242-277: independent
    # velocity and pressure-Schur solves, no divergence coupling — kept for
    # capability parity; expect ~1.2x the Krylov iterations; see PARITY.md
    # for the pressure-block deviation from the reference's ILU(M_p)).
    precond_structure: str = "triangular"
    precond_kp_iters: int = 30  # Jacobi-CG iterations on the pressure Laplacian
    precond_twolevel_cycles: int = 1  # V-cycles of the aggregation two-grid Schur
    kp_regularization: float = 1e-6  # K_p += eps * M_p (reference: cpp:536,828)
    # Pressure spaces up to this size use a precomputed dense K_p^{-1}
    # (one MXU matmul per preconditioner application instead of a CG kernel
    # chain; measured 56 ms -> ~2 ms per application on mesh-2D-100).  The
    # inverse is built once on the host and disk-cached; 20k^2 f32 = 1.6 GB
    # of HBM, well within budget.
    precond_schur_dense_max: int = 20000
    # Storage of the dense K_p^{-1}: "f32" (default), "f16" (half the HBM
    # bytes per apply; entries pre-scaled by a power of two for range) or
    # "bf16x2" (hi/lo split, f32 bytes but native-MXU bf16 passes).  The
    # apply is byte-bound (docs/roofline.json) so "f16" targets ~2x on the
    # biggest per-iteration kernel; naive single bf16 is NOT offered — its
    # 8-bit mantissa destroys FGMRES convergence (measured).
    kp_inv_storage: str = "f32"
    # Include the grad-div coefficient in the Schur mass term:
    #   z_p = -(rho/dt) K_p^{-1} t - theta*(nu + gamma) M_p^{-1} t.
    # The weak form carries grad-div gamma=0.1 (reference cpp:463,793) but
    # the reference's Cahouet-Chabard ignores it; for grad-div-stabilized
    # systems the Schur complement's mass part scales with (nu + gamma)
    # (augmented-Lagrangian preconditioning literature), a ~100x coefficient
    # change at nu~1e-3.  Matters exactly where mass-dominance is weak:
    # measured on 2D-1 (CPU f64, 888-node mesh) it cuts the continuation
    # ladder's total Krylov work 4585 -> 2109 iterations (2.2x, same fixed
    # point to 6 digits) but COSTS 29% on the fixed dt=0.1 march where
    # (rho/dt) M_p dominance already carries the CC approximation.  None =
    # auto: on under steady_continuation (the large-dt regime), off on
    # fixed-dt marches.
    schur_gd_mass: bool | None = None

    def schur_gd_mass_on(self) -> bool:
        """Resolve the schur_gd_mass tri-state (None = auto: follow
        steady_continuation, the regime where it was measured to win)."""
        if self.schur_gd_mass is None:
            return self.steady_continuation
        return self.schur_gd_mass

    # Krylov operator evaluation: "quadrature" (sum-factorized shared-table
    # GEMMs, re-derives the form per application), "tile" (per-tile dense
    # node-block matrices assembled ONCE per step via exact one-hot MXU
    # contractions — the TPU analog of the reference's assembled Trilinos
    # matrix + SpMV, ops/tile_operator.py; amortizes the slot gathers over
    # the ~7 Krylov applications per step), or "element" (batched
    # per-element matrices; also the reference for correctness tests).
    # All evaluate the identical bilinear form.
    operator_path: str = "quadrature"
    # Elements per tile on the "tile" path: 32 puts a 2D tile's node-slot
    # count at exactly 128 (the f32 lane width) on the benchmark meshes.
    # NOTE: bench.py measures fastest at tile_elements=16 on mesh-2D-100
    # (BENCH_TILE_E default) — the half-tile's smaller slot gather beats the
    # fuller MXU tile there; 32 remains the right default at larger meshes.
    tile_elements: int = 32
    # Element->tile clustering: "auto" evaluates both orderings at build
    # time and keeps the one with the smaller padded slot width un (the
    # only quantity the static shapes see; every Krylov application pays
    # ~7 ns per padded slot).  "rcb" = recursive coordinate bisection
    # into exact-tile_e compact boxes (un 104 -> 80 on mesh-2D-100/te=16,
    # a ~23% cut of the gather/accumulate cost; loses on strongly graded
    # meshes whose count-median boxes straddle the grading interface);
    # "morton" = raw Z-order curve (the round-3 behavior).
    tile_cluster: str = "auto"
    # Tile-RESIDENT Krylov vectors (operator_path="tile" only): FGMRES runs
    # on tile-local slot vectors with owner-masked inner products, so the
    # per-iteration slot gather + accumulation shrinks to the inter-tile
    # interface exchange (ops/tile_operator.py).  Identical mathematics —
    # the Krylov trajectory matches the nodal path to roundoff.  Measured
    # SLOWER on the bench config (9.0 vs 11.6 steps/s, TPU v5e) and pays a
    # ~25-minute first compile: the Krylov vector ops run on nt*un*(dim+1)
    # slots (~2.6x the nodal length), which costs more than the removed
    # gather bracketing saves at ~6 its/step.  Kept as an option — the
    # tradeoff reverses when iteration counts are high.
    tile_resident: bool = False

    # Numerics
    dtype: str = "float32"  # "float32" | "float64"
    rho: float = RHO

    def resolved_deltat(self) -> float:
        return self.deltat if self.deltat > 0 else compute_default_deltat(self.Re)

    @property
    def theta(self) -> float:
        return 0.5 if self.time_scheme == TimeScheme.CRANK_NICOLSON else 1.0

    @property
    def nu(self) -> float:
        """nu = U_mean * D / Re (reference: NavierStokes.cpp:64-70)."""
        u_mean = mean_velocity_factor(self.dim) * self.U_m
        return u_mean * CYLINDER_D / self.Re

    def np_dtype(self):
        return np.float64 if self.dtype == "float64" else np.float32
