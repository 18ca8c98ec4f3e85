"""Round-4 headline probes, stage 2: stack the stage-1 winners.

Stage 1 (exp_headline_r4.py, 150-step x2 windows from one t=5 snapshot):
  bench w24 recheck 13.0/13.8 | extrap_u 8.3 (its 6->11, LOSER)
  w48 14.2/13.7 | alloc12 14.6/13.8 | kp-twogrid 7.6 (LOSER)
  tile8 12.0 (LOSER)
This stage stacks alloc12 + w48 and A/Bs the additive P1-coarse velocity
smoother (saves the multiplicative variant's extra velocity-block
application per preconditioner call) at that config.

Usage: python scripts/exp_headline_r4b.py [timed_steps]
"""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from navier_stokes_equations_tpu.utils.platform import configure
configure()
import jax
import numpy as np

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases

N = int(sys.argv[1]) if len(sys.argv) > 1 else 150

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
base = dataclasses.replace(
    test_cases.make('2D-2', deltat=0.01), dtype='float32',
    operator_path='tile', tile_elements=16,
    precond_p1_iters=1, gmres_alloc=16,
)
s0 = solver.NavierStokesSolver(base, mesh)
st0 = s0.initial_state()
t0 = time.time()
st0, m = s0.run_async(500, state=st0, window=24)
jax.block_until_ready(st0.x_old)
_ = float(np.asarray(m.drag))
print(f'warmup 500 steps {time.time()-t0:.0f}s, its_last {int(m.gmres_iters)}',
      flush=True)

CANDS = [
    # base now uses tile_cluster='rcb' (un 104 -> 80 on this mesh/te=16).
    ('rcb w24                 ', {}, 24),
    ('rcb alloc12 w48         ', dict(gmres_alloc=12), 48),
    ('morton alloc12 w48      ',
     dict(gmres_alloc=12, tile_cluster='morton'), 48),
    ('rcb alloc12 w48 additive',
     dict(gmres_alloc=12, precond_vel_method='p1coarse'), 48),
    ('rcb t32 alloc12 w48     ',
     dict(gmres_alloc=12, tile_elements=32), 48),
    ('rcb alloc12 w48 (again) ', dict(gmres_alloc=12), 48),
]

for name, over, w in CANDS:
    cfg = dataclasses.replace(base, **over)
    s = solver.NavierStokesSolver(cfg, mesh)
    st = dataclasses.replace(
        st0, x_old=st0.x_old + 0, x_old_old=st0.x_old_old + 0
    )
    st, m = s.run_async(2 * w, state=st, window=w)  # compile + settle
    jax.block_until_ready(st.x_old)
    _ = float(np.asarray(m.drag))
    rates = []
    for _rep in range(3):
        t0 = time.time()
        st, m = s.run_async(N, state=st, window=w)
        jax.block_until_ready(st.x_old)
        _ = float(np.asarray(m.drag))
        rates.append(N / (time.time() - t0))
    print(f'{name} {" /".join(f"{r:6.2f}" for r in sorted(rates))} steps/s  '
          f'its_last {int(m.gmres_iters):3d}  Cd {float(np.asarray(m.drag)):.3f}',
          flush=True)
