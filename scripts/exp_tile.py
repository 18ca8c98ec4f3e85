"""Tile-operator probe on the bench mesh: build + apply microbench, then e2e.

Usage: python scripts/exp_tile.py [tile_e ...]
"""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from navier_stokes_equations_tpu.utils.platform import configure
configure()
import jax
import jax.numpy as jnp
import numpy as np

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.ops import assembly, fe_arrays, matfree, tile_operator
from navier_stokes_equations_tpu.models import test_cases

tile_sizes = [int(a) for a in sys.argv[1:]] or [16, 32]

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
fe = fe_arrays.build_fe_arrays(mesh, dtype=jnp.float32)
print(f'n_el {fe.n_el} n_dofs {fe.n_dofs} n_vnodes {fe.n_vnodes}', flush=True)

rng = np.random.default_rng(0)
params = assembly.StepParams(dt=0.01, theta=0.5, nu=0.001, rho=1.0, gamma=0.0, use_supg=False)
u_adv = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3, jnp.float32)
x = jnp.asarray(rng.normal(size=fe.n_dofs), jnp.float32)

def timeit(f, n=20):
    y = f()
    jax.block_until_ready(y)
    _ = float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])  # force pull (axon defers)
    t0 = time.time()
    for _ in range(n):
        y = f()
    jax.block_until_ready(y)
    _ = float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
    return (time.time() - t0) / n * 1e3

A_e, _ = jax.jit(lambda u: assembly.oseen_system(fe, params, u, u * 0.5))(u_adv)
jax.block_until_ready(A_e)

# Quadrature apply baseline.
qapply = jax.jit(lambda v: matfree.make_system_operator(fe, params, u_adv)(v))
print(f'quadrature apply: {timeit(lambda: qapply(x)):.2f} ms', flush=True)
asm = jax.jit(lambda u: assembly.oseen_system(fe, params, u, u * 0.5))
print(f'oseen_system (A_e+b_e): {timeit(lambda: asm(u_adv)):.2f} ms', flush=True)

for te in tile_sizes:
    t0 = time.time()
    tiles = tile_operator.build_tile_arrays(mesh, fe, tile_e=te)
    host_s = time.time() - t0
    C = fe.dim + 1
    mb = tiles.n_tiles * (C * tiles.un) ** 2 * 4 / 1e6
    print(f'-- tile_e={te}: {tiles.n_tiles} tiles, un={tiles.un}, A_t {mb:.0f} MB '
          f'(host build {host_s:.1f}s)', flush=True)
    build = jax.jit(lambda A: tile_operator.build_tile_matrices(fe, tiles, A))
    bt = timeit(lambda: build(A_e), n=5)
    A_t = build(A_e)
    jax.block_until_ready(A_t)
    op = jax.jit(lambda v, T: tile_operator.make_tile_operator(fe, tiles, T)(v))
    at = timeit(lambda: op(x, A_t))
    vb = jax.jit(lambda v, T: tile_operator.make_tile_operator(fe, tiles, T).velocity_block(v))
    vt = timeit(lambda: vb(x, A_t))
    y_q, y_t = np.asarray(qapply(x)), np.asarray(op(x, A_t))
    err = np.abs(y_t - y_q).max() / np.abs(y_q).max()
    print(f'   build {bt:.2f} ms, apply {at:.2f} ms, vel_block {vt:.2f} ms, '
          f'rel err {err:.2e}', flush=True)
