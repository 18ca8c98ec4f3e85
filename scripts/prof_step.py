import time, dataclasses, jax, jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.ops import assembly, operators, matfree
from navier_stokes_equations_tpu.solvers import preconditioners

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
cfg = dataclasses.replace(test_cases.make('2D-2', deltat=0.01), dtype='float32')
s = solver.NavierStokesSolver(cfg, mesh)
fe, pops = s.fe, s.pressure_ops
print('n_el', fe.n_el, 'n_dofs', fe.n_dofs, 'n_p', fe.n_p, 'nq', fe.nq)

st = s.initial_state()
u_old, _ = fe.split(st.x_old)
params = assembly.StepParams(dt=jnp.float32(0.01), theta=jnp.float32(0.5),
                             nu=jnp.float32(s.nu), rho=cfg.rho,
                             gamma=cfg.grad_div_gamma, use_supg=cfg.use_supg)
x = jnp.ones((fe.n_dofs,), jnp.float32)

def bench(name, fn, *args, n=50):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f'{name:34s} {dt:8.3f} ms')
    return dt

# full raw operator apply (quadrature path)
def apply_full(fe, x, u):
    op = matfree.make_system_operator(fe, params, u)
    return op(x)
def apply_vel(fe, x, u):
    op = matfree.make_system_operator(fe, params, u)
    return op.velocity_block(x)
def apply_div(fe, x, u):
    op = matfree.make_system_operator(fe, params, u)
    return op.divergence(x)
def schur_dense(pops, t):
    return jnp.matmul(pops.kp_inv, t, preferred_element_type=jnp.float32)
def assemble(fe, u):
    A_e, b_e = assembly.oseen_system(fe, params, u, u, None, None)
    return operators.scatter_add(fe, b_e), A_e
def gather_only(fe, y_flat):
    return jnp.concatenate([y_flat[g].sum(axis=1) for g in fe.dof_gather])

bench('operator apply (full)', apply_full, fe, x, u_old)
bench('velocity block apply', apply_vel, fe, x, u_old)
bench('divergence apply', apply_div, fe, x, u_old)
bench('dense Schur matvec', schur_dense, pops, x[fe.n_udofs:])
bench('assembly (oseen_system+rhs)', assemble, fe, u_old)
yflat = jnp.ones((fe.n_el * fe.nd + 1,), jnp.float32)
bench('accumulation gather (dof_gather)', gather_only, fe, yflat)
