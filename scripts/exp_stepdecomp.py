"""Step-cost decomposition v2 (tile path) on the bench mesh.

Times each piece of one Krylov iteration + per-attempt assembly from a
developed-ish state.  Every timed loop ends with a scalar pull (axon
defers execution until the first D2H transfer); with n=30 the pull
round-trip adds ~1ms to every number — compare relatively.
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

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
cfg = dataclasses.replace(
    test_cases.make('2D-2', deltat=0.01), dtype='float32', operator_path='tile'
)
s = solver.NavierStokesSolver(cfg, mesh)
fe, pops, tiles = s.fe, s.pressure_ops, s.fe.tiles
st = s.initial_state()
st, m = s.run_async(120, state=st, window=8)
jax.block_until_ready(st.x_old)
_ = float(np.asarray(m.drag))
print(f'warm, its_last {int(m.gmres_iters)}', flush=True)

u_old, _ = fe.split(st.x_old)
u_oo, _ = fe.split(st.x_old_old)
u_star = assembly.extrapolate_advection(u_old, u_oo, jnp.asarray(False))
params = assembly.StepParams(
    dt=jnp.float32(0.01), theta=jnp.float32(0.5), nu=jnp.float32(s.nu),
    rho=cfg.rho, gamma=cfg.grad_div_gamma, use_supg=False,
)
x = st.x_old
mask = s.dirichlet.mask

def timeit(name, f, n=30):
    y = f(); jax.block_until_ready(y)
    _ = float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        y = f()
    jax.block_until_ready(y)
    _ = float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
    print(f'{name:30s} {(time.time()-t0)/n*1e3:7.2f} ms', flush=True)

# Per-attempt assembly pieces.
rhsdiag = jax.jit(lambda f_, u, uo: assembly.oseen_rhs_diag(f_, params, u, uo))
timeit('oseen_rhs_diag', lambda: rhsdiag(fe, u_star, u_old))
build = jax.jit(lambda f_, t_, u: tile_operator.build_tile_blocks_oseen(f_, t_, params, u))
blk = build(fe, tiles, u_star)
timeit('tile build (fast)', lambda: build(fe, tiles, u_star))

# Krylov-iteration pieces.
app = jax.jit(lambda f_, t_, b_, v: tile_operator.make_tile_operator(f_, t_, b_)(v))
timeit('tile apply', lambda: app(fe, tiles, blk, x))

def full_precond(f_, t_, b_, po, di, v):
    op = tile_operator.make_tile_operator(f_, t_, b_)
    n_u = f_.n_udofs
    vel = lambda z: jnp.where(mask, z, op.velocity_block(
        jnp.where(mask, 0.0, z.at[n_u:].set(0.0))).at[n_u:].set(0.0))
    div = lambda z_u: op.divergence(jnp.where(mask, 0.0, z_u))
    pc = preconditioners.make_cahouet_chabard(
        f_, po, None, mask, dt=params.dt, theta=params.theta, nu=params.nu,
        rho=cfg.rho, vel_method=cfg.precond_vel_method,
        vel_apply=vel, div_apply=div, diag=di,
        p1_iters=cfg.precond_p1_iters, kp_iters=cfg.precond_kp_iters,
        twolevel_cycles=cfg.precond_twolevel_cycles, schur=cfg.precond_schur,
    )
    return pc(v)

diag_e, _ = rhsdiag(fe, u_star, u_old)
from navier_stokes_equations_tpu.ops import operators as ops_mod
diag = jnp.where(mask, 1.0, ops_mod.scatter_add(fe, diag_e))
diag = jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)
pc_jit = jax.jit(full_precond)
timeit('full precond apply', lambda: pc_jit(fe, tiles, blk, pops, diag, x))

# Preconditioner internals.
kp = jax.jit(lambda po, v: preconditioners.make_kp_solve(
    fe, po, kp_iters=cfg.precond_kp_iters,
    twolevel_cycles=cfg.precond_twolevel_cycles)(v))
tp = jnp.asarray(np.random.default_rng(1).normal(size=fe.n_p), jnp.float32)
timeit('kp_solve (Schur core)', lambda: kp(pops, tp))

coarse = jax.jit(lambda f_, po, r2: preconditioners.make_p1_coarse_solve(
    f_, po, cfg.rho / 0.01, 0.5 * s.nu, iters=cfg.precond_p1_iters)(
        preconditioners.p1_restrict(po, r2)))
r2 = jnp.asarray(np.random.default_rng(2).normal(size=(fe.n_vnodes, fe.dim)), jnp.float32)
timeit('p1 coarse solve+restrict', lambda: coarse(fe, pops, r2))

vb = jax.jit(lambda f_, t_, b_, v: tile_operator.make_tile_operator(f_, t_, b_).velocity_block(v))
timeit('tile vel_block', lambda: vb(fe, tiles, blk, x))
dvj = jax.jit(lambda f_, t_, b_, v: tile_operator.make_tile_operator(f_, t_, b_).divergence(v[:f_.n_udofs]))
timeit('tile divergence', lambda: dvj(fe, tiles, blk, x))

# Gather/accumulate isolation.
ga = jax.jit(lambda t_, v: jnp.concatenate(
    [v[:fe.n_udofs].reshape(fe.dim, fe.n_vnodes).T,
     jnp.pad(v[fe.n_udofs:], (0, fe.n_vnodes - fe.n_p))[:, None]], axis=1
)[jnp.minimum(t_.tile_nodes, fe.n_vnodes - 1)])
timeit('slot gather only', lambda: ga(tiles, x))
