"""The six Schaefer-Turek benchmark presets.

Mirror of the reference factories (reference: src/classes/TestCases.hpp:
97-306) and of ``BenchmarkInletVelocity`` (TestCases.hpp:14-89):

  2D-1   steady,   Re=20,  U_m=0.3,  Newton + BE,        ramp 1.0 s
  2D-2   unsteady, Re=100, U_m=1.5,  Linearized + CN,    ramp 2.0 s
  2D-3   Re(t) in [0,100], U_m=1.5,  Linearized + CN,    sin(pi t/8) inlet
  3D-1Z  steady,   Re=20,  U_m=0.45, Newton + BE,  SUPG
  3D-2Z  unsteady, Re=100, U_m=2.25, Lin + CN, SUPG,     ramp 4.0 s, dt=0.01
  3D-3Z  Re(t) in [0,100], U_m=2.25, Lin + CN, SUPG,     sin inlet, dt=0.01

Inlet profiles (TestCases.hpp:40-51): 2D 4 U_m y (H-y)/H^2 on component x;
3D 16 U_m x y (H-x)(H-y)/H^4 on component z.  Optional sin(pi t/8) modulation
and half-cosine startup ramp 0.5 (1 - cos(pi t / T_ramp)) (TestCases.hpp:
53-69).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax.numpy as jnp

from ..config import CHANNEL_H, NonlinearMethod, SolverConfig, TimeScheme


def benchmark_inlet(dim: int, U_m: float, time_dependent: bool, T_ramp: float = 0.0, H: float = CHANNEL_H) -> Callable:
    """jax-traceable inlet profile: (coords (n, dim), t) -> (n, dim)."""

    def profile(coords, t):
        if dim == 2:
            y = coords[:, 1]
            base = 4.0 * U_m * y * (H - y) / (H * H)
        else:
            x = coords[:, 0]
            y = coords[:, 1]
            base = 16.0 * U_m * x * y * (H - x) * (H - y) / (H**4)
        scale = jnp.asarray(1.0, coords.dtype)
        if time_dependent:
            scale = scale * jnp.sin(jnp.pi * t / 8.0)
        if T_ramp > 0.0:
            ramp = jnp.where(
                t < T_ramp, 0.5 * (1.0 - jnp.cos(jnp.pi * t / T_ramp)), 1.0
            )
            scale = scale * ramp
        out = jnp.zeros_like(coords)
        flow_component = 0 if dim == 2 else 2
        return out.at[:, flow_component].set(base * scale)

    return profile


def default_inlet(dim: int, U_m: float, time_dependent: bool = True, H: float = CHANNEL_H) -> Callable:
    """The solver-default profile with the 6.0 coefficient in 2D
    (reference: NavierStokes.hpp:78-110) — kept for parity; all benchmark
    presets override it with ``benchmark_inlet`` (4.0 coefficient)."""

    def profile(coords, t):
        if dim == 2:
            y = coords[:, 1]
            base = 6.0 * U_m * y * (H - y) / (H * H)
        else:
            x = coords[:, 0]
            y = coords[:, 1]
            base = 16.0 * U_m * x * y * (H - x) * (H - y) / (H**4)
        if time_dependent:
            base = base * jnp.sin(jnp.pi * t / 8.0)
        out = jnp.zeros_like(coords)
        flow_component = 0 if dim == 2 else 2
        return out.at[:, flow_component].set(base)

    return profile


def make_2d_1(ts=TimeScheme.BACKWARD_EULER, nm=NonlinearMethod.NEWTON, deltat=-1.0, t_ramp=1.0) -> SolverConfig:
    return SolverConfig(
        name="2D-1",
        description="Steady flow around cylinder, Re=20, U_m=0.3",
        dim=2, Re=20.0, U_m=0.3, T=10.0, deltat=deltat,
        time_scheme=ts, nonlinear_method=nm,
        # Additive P1-coarse: measured 404 -> 94 Krylov its/step at dt=0.1
        # on mesh-2D-100 (the stiffness-dominated large-dt regime).
        precond_vel_method="p1coarse", precond_p1_iters=8,
        inlet_profile=benchmark_inlet(2, 0.3, time_dependent=False, T_ramp=t_ramp),
    )


def make_2d_2(ts=TimeScheme.CRANK_NICOLSON, nm=NonlinearMethod.LINEARIZED, deltat=-1.0) -> SolverConfig:
    return SolverConfig(
        name="2D-2",
        description="Unsteady flow, Re=100, U_m=1.5, constant inlet",
        dim=2, Re=100.0, U_m=1.5, T=8.0, deltat=deltat,
        time_scheme=ts, nonlinear_method=nm,
        # Multiplicative P1-coarse: 19.8 -> 8.1 its/step in developed flow,
        # and a far smaller per-step solution error at equal tolerance (the
        # residual left behind sits in high modes).
        precond_vel_method="p1coarse_mult", precond_p1_iters=2,
        inlet_profile=benchmark_inlet(2, 1.5, time_dependent=False, T_ramp=2.0),
    )


def make_2d_3(ts=TimeScheme.CRANK_NICOLSON, nm=NonlinearMethod.LINEARIZED, deltat=-1.0) -> SolverConfig:
    return SolverConfig(
        name="2D-3",
        description="Unsteady flow, time-varying inlet sin(pi*t/8), U_m=1.5",
        dim=2, Re=100.0, U_m=1.5, T=8.0, deltat=deltat,
        time_scheme=ts, nonlinear_method=nm,
        precond_vel_method="p1coarse_mult", precond_p1_iters=2,
        inlet_profile=benchmark_inlet(2, 1.5, time_dependent=True),
        inlet_time_modulated=True,
    )


def make_3d_1z(ts=TimeScheme.BACKWARD_EULER, nm=NonlinearMethod.NEWTON, deltat=-1.0) -> SolverConfig:
    return SolverConfig(
        name="3D-1Z",
        description="Steady 3D flow, Re=20, U_m=0.45, circular cylinder",
        dim=3, Re=20.0, U_m=0.45, T=10.0, deltat=deltat,
        time_scheme=ts, nonlinear_method=nm, use_supg=True,
        # Additive P1-coarse with the grad-div coarse term: 858 -> 471
        # Krylov its/step (f64 reference run).
        precond_vel_method="p1coarse", precond_p1_iters=8,
        inlet_profile=benchmark_inlet(3, 0.45, time_dependent=False),
    )


def make_3d_2z(ts=TimeScheme.CRANK_NICOLSON, nm=NonlinearMethod.LINEARIZED, deltat=-1.0) -> SolverConfig:
    return SolverConfig(
        name="3D-2Z",
        description="Unsteady 3D flow, Re=100, U_m=2.25, constant inlet",
        dim=3, Re=100.0, U_m=2.25, T=8.0,
        deltat=(deltat if deltat > 0 else 0.01),
        time_scheme=ts, nonlinear_method=nm, use_supg=True,
        # Multiplicative P1-coarse: 6.5 -> 2.1 its/step, and the rtol=1e-4
        # trace tracks the rtol=1e-6 ground truth where Jacobi's does not
        # (tolerance-error direction study, docs/DESIGN.md).
        precond_vel_method="p1coarse_mult", precond_p1_iters=4,
        inlet_profile=benchmark_inlet(3, 2.25, time_dependent=False, T_ramp=4.0),
    )


def make_3d_3z(ts=TimeScheme.CRANK_NICOLSON, nm=NonlinearMethod.LINEARIZED, deltat=-1.0) -> SolverConfig:
    return SolverConfig(
        name="3D-3Z",
        description="Unsteady 3D flow, time-varying inlet sin(pi*t/8), U_m=2.25",
        dim=3, Re=100.0, U_m=2.25, T=8.0,
        deltat=(deltat if deltat > 0 else 0.01),
        time_scheme=ts, nonlinear_method=nm, use_supg=True,
        precond_vel_method="p1coarse_mult", precond_p1_iters=4,
        inlet_profile=benchmark_inlet(3, 2.25, time_dependent=True),
        inlet_time_modulated=True,
    )


REGISTRY = {
    "2D-1": make_2d_1,
    "2D-2": make_2d_2,
    "2D-3": make_2d_3,
    "3D-1Z": make_3d_1z,
    "3D-2Z": make_3d_2z,
    "3D-3Z": make_3d_3z,
}


def make(name: str, **kwargs) -> SolverConfig:
    if name not in REGISTRY:
        raise KeyError(f"unknown test case {name!r}; available: {sorted(REGISTRY)}")
    cfg = REGISTRY[name](**kwargs)
    return cfg
