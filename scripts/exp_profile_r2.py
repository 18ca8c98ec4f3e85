"""Round-2 step-cost decomposition on the real TPU (mesh-2D-100, 2D-2).

Every timed loop ends with a SCALAR PULL (axon defers execution until the
first device->host transfer, so block_until_ready alone lies).  Times the
pieces that compose one Krylov iteration and one full step to find where
the 21 ms/iteration goes.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ns_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.ops import assembly, matfree, operators, functionals
from navier_stokes_equations_tpu.solvers import preconditioners

mesh = taylor_hood.load("/root/reference/meshes/mesh-2D-100.msh")
cfg = dataclasses.replace(test_cases.make("2D-2", deltat=0.01), dtype="float32")
s = solver.NavierStokesSolver(cfg, mesh)
fe, pops = s.fe, s.pressure_ops
print("n_el", fe.n_el, "n_dofs", fe.n_dofs, "nq", fe.nq, flush=True)

# Warm to developed-ish flow so iteration counts are realistic.
st = s.initial_state()
st, m = s.run_async(30, state=st)
print("warm: gmres_iters", m.gmres_iters, "conv", m.converged, flush=True)

params = assembly.StepParams(
    dt=jnp.float32(0.01), theta=jnp.float32(0.5), nu=jnp.float32(s.nu),
    rho=cfg.rho, gamma=cfg.grad_div_gamma, use_supg=cfg.use_supg,
)
u_old, _ = fe.split(st.x_old)
x = jnp.array(st.x_old)


def bench(name, fn, *args, n=100):
    f = jax.jit(fn)
    r = f(*args)
    float(jnp.asarray(r).ravel()[0])  # sync + materialize
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    pulled = float(jnp.asarray(r).ravel()[0])  # forces the deferred chain
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {dt:8.3f} ms   (pull={pulled:.3e})", flush=True)
    return dt


# --- per-Krylov-iteration pieces -------------------------------------
tables = matfree.advection_tables(fe, params, u_old)


def apply_op(fe, x, u):
    op = matfree.make_system_operator(fe, params, u)
    return op(x)[::1000]


t_apply = bench("operator apply (quadrature matfree)", apply_op, fe, x, u_old)

diag_e, b_e = assembly.oseen_rhs_diag(fe, params, u_old, u_old, None, None)
Ad = jnp.where(s.dirichlet.mask, 1.0, operators.scatter_add(fe, diag_e))
Ad = jnp.where(jnp.abs(Ad) > 1e-30, Ad, 1.0)


def make_pc(fe, pops, Ad, u, x):
    mask = s.dirichlet.mask
    n_u = fe.n_udofs
    op = matfree.make_system_operator(fe, params, u)

    def vel_apply(z):
        zf = jnp.where(mask, 0.0, z.at[n_u:].set(0.0))
        y = op.velocity_block(zf).at[n_u:].set(0.0)
        return jnp.where(mask, z, y)

    def div_apply(z_u):
        return op.divergence(jnp.where(mask, 0.0, z_u))

    pc = preconditioners.make_cahouet_chabard(
        fe, pops, None, mask,
        dt=params.dt, theta=params.theta, nu=s.nu, rho=cfg.rho,
        vel_sweeps=cfg.precond_vel_sweeps, kp_iters=cfg.precond_kp_iters,
        vel_method=cfg.precond_vel_method, vel_degree=cfg.precond_vel_degree,
        vel_apply=vel_apply, div_apply=div_apply, diag=Ad,
        twolevel_cycles=cfg.precond_twolevel_cycles,
        p1_iters=cfg.precond_p1_iters, schur=cfg.precond_schur,
    )
    return pc(x)[::1000]


try:
    t_pc = bench("preconditioner apply (full CC)", make_pc, fe, pops, Ad, u_old, x)
except Exception as e:
    print("preconditioner bench failed:", e, flush=True)
    t_pc = float("nan")


def kp_dense(pops, t):
    return jnp.matmul(pops.kp_inv, t, preferred_element_type=jnp.float32)[::1000]


t_kp = bench("dense K_p^-1 matvec", kp_dense, pops, x[fe.n_udofs:])


def coarse(fe, pops, r):
    cs = preconditioners.make_p1_coarse_solve(
        fe, pops, jnp.float32(100.0), jnp.float32(0.0005),
        iters=cfg.precond_p1_iters,
    )
    r2 = r[: fe.n_udofs].reshape(fe.dim, fe.n_vnodes).T
    z1 = cs(preconditioners.p1_restrict(pops, r2))
    return preconditioners.p1_prolong(pops, z1)[::1000]


t_coarse = bench("P1 coarse restrict+solve+prolong", coarse, fe, pops, x)

# CGS2 projection cost at the allocated basis length.
V = jnp.ones((cfg.gmres_alloc, fe.n_dofs), jnp.float32)


def cgs2(V, w):
    h = V @ w
    w2 = w - V.T @ h
    h2 = V @ w2
    return (w2 - V.T @ h2)[::1000]


t_cgs2 = bench(f"CGS2 double projection (alloc={cfg.gmres_alloc})", cgs2, V, x)

# --- per-step pieces ---------------------------------------------------
def asm(fe, u, uo):
    diag_e, b_e = assembly.oseen_rhs_diag(fe, params, u, uo, None, None)
    tab = matfree.advection_tables(fe, params, u)
    return operators.scatter_add(fe, b_e)[::1000]


t_asm = bench("assembly rhs+diag+tables", asm, fe, u_old, u_old)


def funcs(fe, x):
    u, p = fe.split(x)
    cd, cl = functionals.lift_drag(
        fe, s.force_tables, u, p, nu=s.nu, rho=cfg.rho, U_m=cfg.U_m
    )
    dp = functionals.pressure_difference(fe, s.probe_tables, p)
    return jnp.stack([cd, cl, dp])


t_fn = bench("functionals (forces + dp)", funcs, fe, x)

# --- full attempt program + host loop --------------------------------
state2 = st
t0 = time.perf_counter()
NS = 30
state2, m2 = s.run_async(NS, state=state2)
t_step = (time.perf_counter() - t0) / NS * 1e3
print(f"{'full step wall (run_async w=1)':44s} {t_step:8.3f} ms", flush=True)

t0 = time.perf_counter()
state2, m3 = s.run_async(NS, state=state2, window=8)
t_step8 = (time.perf_counter() - t0) / NS * 1e3
print(f"{'full step wall (run_async w=8)':44s} {t_step8:8.3f} ms", flush=True)
print("last gmres_iters", m3.gmres_iters, flush=True)

n_it = max(m3.gmres_iters, 1)
per_it = t_apply + t_pc + t_cgs2
print(f"\nmodel: asm {t_asm:.1f} + {n_it} x (apply {t_apply:.1f} + pc {t_pc:.1f} "
      f"+ cgs2 {t_cgs2:.2f}) + fn {t_fn:.1f} = "
      f"{t_asm + n_it * per_it + t_fn:.1f} ms vs measured {t_step8:.1f} ms", flush=True)
