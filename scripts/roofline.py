"""HBM-roofline accounting for the hot kernels on the bench config.

VERDICT round-3 item 5: "is it actually fast" needs an absolute answer,
not only a CPU-relative one.  The tile-path Krylov application and the
Cahouet-Chabard Schur core are HBM-bandwidth-bound on TPU v5e (the MXU
FLOPs are negligible at these sizes), so the honest utilization number
is bytes-moved / (measured time x HBM peak).

Byte model (f32, 2D Oseen uncoupled tile path; shapes in
ops/tile_operator.py):
  apply  reads  S (nt,un,un) + G (nt,dim,un,un_p) + H (nt,dim,un_p,un)
         + gather of x into slots (nt,un,dim+1) (counted once: the
         gather READS x through the index map and WRITES the slot
         tensor) + index maps (int32 tile_nodes + bucketed acc maps)
         writes the slot result (nt,un,dim+1) and y (n_dofs)
  dense K_p^-1 matvec reads n_p^2 f32 (1.3 GB at n_p=17,993).

Prints one line per kernel: measured ms, byte count, achieved GB/s,
% of the 819 GB/s v5e HBM peak.  Run on the TPU.

Usage: python scripts/roofline.py
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
from navier_stokes_equations_tpu.ops import assembly, tile_operator
from navier_stokes_equations_tpu.solvers import preconditioners

HBM_PEAK_GBPS = 819.0  # TPU v5e HBM2E peak

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
cfg = dataclasses.replace(
    test_cases.make('2D-2', deltat=0.01), dtype='float32',
    operator_path='tile', tile_elements=32,  # headline tiling (RCB auto cluster)
    precond_p1_iters=1, gmres_alloc=16,
)
s = solver.NavierStokesSolver(cfg, mesh)
fe, pops, tiles = s.fe, s.pressure_ops, s.fe.tiles

# Developed-ish state for a realistic advection field.
st = s.initial_state()
st, m = s.run_async(120, state=st, window=8)
jax.block_until_ready(st.x_old)
_ = float(np.asarray(m.drag))

u_old, _ = fe.split(st.x_old)
u_oo, _ = fe.split(st.x_old_old)
u_star = assembly.extrapolate_advection(u_old, u_oo, jnp.asarray(False))
params = assembly.StepParams(
    dt=jnp.float32(0.01), theta=jnp.float32(0.5), nu=jnp.float32(s.nu),
    rho=cfg.rho, gamma=cfg.grad_div_gamma, use_supg=False,
)
blk = jax.jit(lambda f_, t_, u: tile_operator.build_tile_blocks_oseen(
    f_, t_, params, u))(fe, tiles, u_star)
x = st.x_old


def timeit(f, n=50):
    y = f(); jax.block_until_ready(y)
    _ = float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = f()
    jax.block_until_ready(y)
    _ = float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n


RESULTS = {}


def report(name, ms, nbytes):
    gbps = nbytes / 1e9 / (ms / 1e3)
    print(f'{name:28s} {ms:8.3f} ms  {nbytes/1e6:9.1f} MB  '
          f'{gbps:7.1f} GB/s  {100*gbps/HBM_PEAK_GBPS:5.1f}% of peak',
          flush=True)
    RESULTS[name] = {'ms': round(ms, 3), 'MB': round(nbytes / 1e6, 1),
                     'GBps': round(gbps, 1),
                     'pct_of_hbm_peak': round(100 * gbps / HBM_PEAK_GBPS, 1)}
    return gbps


nt, un, un_p, dim = tiles.n_tiles, tiles.un, tiles.un_p, fe.dim
f4 = 4  # f32/int32 bytes
slots = nt * un * (dim + 1)

# --- tile apply -------------------------------------------------------
app = jax.jit(lambda f_, t_, b_, v: tile_operator.make_tile_operator(
    f_, t_, b_)(v))
ms = timeit(lambda: app(fe, tiles, blk, x)) * 1e3
b_blocks = (nt * un * un + 2 * nt * dim * un * un_p) * f4  # S + G + H
b_gather = fe.n_dofs * f4 + nt * un * f4 + slots * f4  # x + ids + slot write
b_matvec_out = slots * f4  # (nt, un, dim+1) result write
acc_reads = slots * f4 + slots * f4  # slot results + int32 maps (upper bound)
b_y = fe.n_dofs * f4
nbytes = b_blocks + b_gather + b_matvec_out + acc_reads + b_y
print(f'# mesh-2D-100: n_dofs={fe.n_dofs}, n_p={fe.n_p}, nt={nt}, '
      f'un={un}, un_p={un_p}, slots={slots}')
report('tile apply (Krylov op)', ms, nbytes)

# --- dense K_p^-1 matvec (Schur core) --------------------------------
kp = jax.jit(lambda po, v: preconditioners.make_kp_solve(
    fe, po, kp_iters=cfg.precond_kp_iters,
    twolevel_cycles=cfg.precond_twolevel_cycles)(v))
tp = jnp.asarray(np.random.default_rng(1).normal(size=fe.n_p), jnp.float32)
ms = timeit(lambda: kp(pops, tp)) * 1e3
report('dense K_p^-1 matvec', ms, fe.n_p * fe.n_p * f4)

# --- CGS2 vector algebra (dots + AXPYs over n_dofs) -------------------
# One CGS2 orthogonalization against k vectors reads the basis twice
# (two projection passes); model at k=8 (alloc 16, typical depth ~6).
k = 8
V = jnp.asarray(np.random.default_rng(2).normal(
    size=(k, fe.n_dofs)), jnp.float32)
w = jnp.asarray(np.random.default_rng(3).normal(size=fe.n_dofs), jnp.float32)


@jax.jit
def cgs2(V_, w_):
    h1 = V_ @ w_
    w1 = w_ - V_.T @ h1
    h2 = V_ @ w1
    return w1 - V_.T @ h2


ms = timeit(lambda: cgs2(V, w)) * 1e3
report(f'CGS2 pass (k={k})', ms, (4 * k + 4) * fe.n_dofs * f4)

# --- full preconditioned step context ---------------------------------
print('# context: ~6 Krylov its/step at developed flow; each it = '
      '1 apply + 1 CC precond (vel smoother + Schur) + CGS2.')

# Persist for bench.py to fold into its JSON line (docs/roofline.json is
# committed; bench reports it as a measured-by-scripts/roofline.py field).
import json
out = {
    'config': f'mesh-2D-100 tile te={cfg.tile_elements} f32 (headline)',
    'hbm_peak_GBps': HBM_PEAK_GBPS,
    'kernels': RESULTS,
}
path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'docs', 'roofline.json')
with open(path, 'w') as f:
    json.dump(out, f, indent=1)
print(f'# wrote {path}')
