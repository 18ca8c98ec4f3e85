"""Tile-v2 operator probe on the bench mesh: micro + end-to-end A/B.

Usage: python scripts/exp_tile.py [n_steps]
"""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from navier_stokes_equations_tpu.utils.platform import configure
configure()
import jax
import jax.numpy as jnp
import numpy as np

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.ops import assembly, fe_arrays, matfree, tile_operator

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
cfg = dataclasses.replace(
    test_cases.make('2D-2', deltat=0.01), dtype='float32', operator_path='tile'
)
s = solver.NavierStokesSolver(cfg, mesh)
fe = s.fe
tiles = fe.tiles
print(f'n_el {fe.n_el} n_dofs {fe.n_dofs} nt {tiles.n_tiles} un {tiles.un} '
      f'un_p {tiles.un_p}', flush=True)

rng = np.random.default_rng(0)
params = assembly.StepParams(
    dt=jnp.float32(0.01), theta=jnp.float32(0.5), nu=jnp.float32(s.nu),
    rho=cfg.rho, gamma=cfg.grad_div_gamma, use_supg=False,
)
u_adv = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3, jnp.float32)
x = jnp.asarray(rng.normal(size=fe.n_dofs), jnp.float32)

def timeit(f, n=30):
    y = f(); jax.block_until_ready(y)
    _ = float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        y = f()
    jax.block_until_ready(y)
    _ = float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
    return (time.time() - t0) / n * 1e3

# Micro: build + apply vs quadrature apply.
build = jax.jit(lambda f_, t_, u: tile_operator.build_tile_blocks_oseen(f_, t_, params, u))
blk = build(fe, tiles, u_adv)
print(f'tile fast build: {timeit(lambda: build(fe, tiles, u_adv)):.2f} ms', flush=True)
app = jax.jit(lambda f_, t_, b_, v: tile_operator.make_tile_operator(f_, t_, b_)(v))
print(f'tile apply: {timeit(lambda: app(fe, tiles, blk, x)):.2f} ms', flush=True)
vb = jax.jit(lambda f_, t_, b_, v: tile_operator.make_tile_operator(f_, t_, b_).velocity_block(v))
print(f'tile vel_block: {timeit(lambda: vb(fe, tiles, blk, x)):.2f} ms', flush=True)
dv = jax.jit(lambda f_, t_, b_, v: tile_operator.make_tile_operator(f_, t_, b_).divergence(v))
print(f'tile divergence: {timeit(lambda: dv(fe, tiles, blk, x)):.2f} ms', flush=True)
qap = jax.jit(lambda f_, v: matfree.make_system_operator(f_, params, u_adv)(v))
print(f'quadrature apply: {timeit(lambda: qap(fe, x)):.2f} ms', flush=True)
y_q, y_t = np.asarray(qap(fe, x)), np.asarray(app(fe, tiles, blk, x))
print(f'rel err tile vs quadrature: {np.abs(y_t - y_q).max() / np.abs(y_q).max():.2e}',
      flush=True)

# End-to-end A/B on developed-ish flow.
for path in ('tile', 'quadrature'):
    cfg2 = dataclasses.replace(cfg, operator_path=path)
    s2 = solver.NavierStokesSolver(cfg2, mesh)
    st = s2.initial_state()
    t0 = time.time()
    st, m = s2.run_async(60, state=st, window=8)
    jax.block_until_ready(st.x_old)
    _ = float(np.asarray(m.drag))
    print(f'{path}: warm 60 steps {time.time()-t0:.1f}s', flush=True)
    t0 = time.time()
    st, m = s2.run_async(N, state=st, window=8)
    jax.block_until_ready(st.x_old)
    _ = float(np.asarray(m.drag))
    dt_w = time.time() - t0
    print(f'{path}: {N} steps {dt_w:.2f}s -> {N/dt_w:.2f} steps/s, '
          f'its_last {int(m.gmres_iters)} Cd {float(m.drag):.4f}', flush=True)
