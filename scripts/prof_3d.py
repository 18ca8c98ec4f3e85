import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import test_cases
from navier_stokes_equations_tpu.ops import assembly, fe_arrays, matfree, operators

mesh = taylor_hood.load('meshes/mesh-3D-medium.msh')
fe = fe_arrays.build_fe_arrays(mesh)
_ = np.asarray(fe.jxw[:1])  # force honest (non-deferred) execution mode
params = assembly.StepParams(dt=jnp.float32(0.01), theta=jnp.float32(0.5),
                             nu=jnp.float32(0.001), rho=1.0, gamma=0.1, use_supg=True)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((fe.n_vnodes, 3)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((fe.n_dofs,)).astype(np.float32))

def bench(name, fn, *args, n=30):
    f = jax.jit(fn); r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    print(f'{name:40s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms', flush=True)

def apply_full(fe, x, u):
    return matfree.make_system_operator(fe, params, u)(x)
def apply_div(fe, x, u):
    return matfree.make_system_operator(fe, params, u).divergence(x)
def accum(fe, y_e):
    return fe.accumulate(y_e)
def rhs_diag(fe, u):
    return assembly.oseen_rhs_diag(fe, params, u, u)

bench('3D operator apply (full, supg)', apply_full, fe, x, u)
bench('3D divergence apply', apply_div, fe, x, u)
y_e = jnp.asarray(rng.standard_normal((fe.n_el, fe.nd)).astype(np.float32))
bench('3D accumulate only', accum, fe, y_e)
bench('3D rhs+diag assembly', rhs_diag, fe, u)
# forward part = apply minus accumulate
