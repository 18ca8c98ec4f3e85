"""Tile diagnostics: isolate build-vs-apply error and cost on TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from navier_stokes_equations_tpu.utils.platform import configure
configure()
import jax
import jax.numpy as jnp
import numpy as np

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.ops import assembly, fe_arrays, operators, tile_operator

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
fe = fe_arrays.build_fe_arrays(mesh, dtype=jnp.float32)
rng = np.random.default_rng(0)
params = assembly.StepParams(dt=0.01, theta=0.5, nu=0.001, rho=1.0, gamma=0.0, use_supg=False)
u_adv = jnp.asarray(rng.normal(size=(fe.n_vnodes, fe.dim)) * 0.3, jnp.float32)
x = jnp.asarray(rng.normal(size=fe.n_dofs), jnp.float32)

def timeit(f, n=10):
    y = f(); jax.block_until_ready(y)
    _ = float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        y = f()
    jax.block_until_ready(y)
    _ = float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
    return (time.time() - t0) / n * 1e3

A_e, _ = jax.jit(lambda u: assembly.oseen_system(fe, params, u, u * 0.5))(u_adv)
jax.block_until_ready(A_e)

eapply = jax.jit(lambda v: operators.apply_element_matrices(fe, A_e, v))
y_e = np.asarray(eapply(x))
print(f'element apply: {timeit(lambda: eapply(x)):.2f} ms', flush=True)

t0 = time.time()
tiles = tile_operator.build_tile_arrays(mesh, fe, tile_e=16)
print(f'tile host build {time.time()-t0:.0f}s', flush=True)

# Reference tile matrices computed on host in f64.
build = jax.jit(lambda A: tile_operator.build_tile_matrices(fe, tiles, A))
A_t = build(A_e); jax.block_until_ready(A_t)
op = jax.jit(lambda v, T: tile_operator.make_tile_operator(fe, tiles, T)(v))
y_t = np.asarray(op(x, A_t))
print(f'tile apply err vs element: {np.abs(y_t - y_e).max() / np.abs(y_e).max():.2e}', flush=True)

# Host-exact tile matrices (f64 numpy) -> device, then apply: isolates
# build error from apply error.
import numpy as _np
Ah = _np.asarray(A_e, _np.float64)
nt, te, un, C = tiles.n_tiles, tiles.tile_e, tiles.un, fe.dim + 1
eo = _np.asarray(tiles.elem_order).reshape(nt, te)
loc = _np.asarray(tiles.loc)
idx = _np.asarray(tiles.row_idx)
nd = fe.nd
Ap = _np.zeros((fe.n_el + 1, nd + 1, nd + 1))
Ap[: fe.n_el, :nd, :nd] = Ah
T_host = _np.zeros((nt, C * un, C * un), _np.float64)
for t in range(min(nt, 40)):  # only a prefix (host loop is slow) for error check
    for k in range(te):
        e = eo[t, k]
        Ab = Ap[e][idx][:, idx].reshape(fe.n2, C, fe.n2, C)
        for a in range(fe.n2):
            for b in range(fe.n2):
                ua, vb = loc[t, k, a], loc[t, k, b]
                for i in range(C):
                    for j in range(C):
                        T_host[t, i * un + ua, j * un + vb] += Ab[a, i, b, j]
T_dev = _np.asarray(A_t[:40], _np.float64)
scale = _np.abs(T_host[:40]).max()
print(f'build err (first 40 tiles) vs host-exact: '
      f'{_np.abs(T_dev - T_host[:40]).max() / scale:.2e}', flush=True)

print(f'device build: {timeit(lambda: build(A_e), n=3):.1f} ms', flush=True)
print(f'tile apply: {timeit(lambda: op(x, A_t)):.2f} ms', flush=True)

# Decompose the apply cost.
def gather_only(v, T):
    dim, nv, n_p, n_u = fe.dim, fe.n_vnodes, fe.n_p, fe.n_udofs
    u = v[:n_u].reshape(dim, nv).T
    p = jnp.pad(v[n_u:], (0, nv - n_p))
    up = jnp.concatenate([u, p[:, None]], axis=1)
    upz = jnp.concatenate([up, jnp.zeros((1, dim + 1), v.dtype)])
    x_t = upz[tiles.tile_nodes]
    return jnp.swapaxes(x_t, 1, 2).reshape(tiles.n_tiles, (dim + 1) * tiles.un)
g_jit = jax.jit(gather_only)
xt = g_jit(x, A_t)
print(f'  gather: {timeit(lambda: g_jit(x, A_t)):.2f} ms', flush=True)
mv = jax.jit(lambda T, v: (T * v[:, None, :]).sum(axis=-1))
print(f'  matvec bcast-sum: {timeit(lambda: mv(A_t, xt)):.2f} ms', flush=True)
mv2 = jax.jit(lambda T, v: jax.lax.dot_general(T, v, (((2,), (1,)), ((0,), (0,)))))
print(f'  matvec dot_general: {timeit(lambda: mv2(A_t, xt)):.2f} ms', flush=True)
yt = mv(A_t, xt)
def acc_only(y_t):
    rows = y_t.reshape(nt, C, un).swapaxes(1, 2).reshape(nt * un, C)
    z = jnp.concatenate([rows, jnp.zeros((1, C), rows.dtype)])
    return jnp.concatenate([z[g].sum(axis=1) for g in tiles.acc_map])
a_jit = jax.jit(acc_only)
print(f'  accumulate: {timeit(lambda: a_jit(yt)):.2f} ms', flush=True)
