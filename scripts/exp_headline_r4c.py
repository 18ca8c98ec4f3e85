"""Round-4 headline probes, stage 3: neighborhood of the stage-2 winner.

Stage 2: rcb + tile_e=32 + p1_iters=1 + alloc12 + w48 = 17.8/18.0/19.1
steps/s (te=16 same flags: 15.2-16.5; morton te=16: 13.5-14.5).  This
stage scans tile_e in {32, 48, 64} and window/alloc around the winner.

Usage: python scripts/exp_headline_r4c.py [timed_steps]
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
    operator_path='tile', tile_elements=32,
    precond_p1_iters=1, gmres_alloc=12,
)
s0 = solver.NavierStokesSolver(base, mesh)
st0 = s0.initial_state()
t0 = time.time()
st0, m = s0.run_async(500, state=st0, window=48)
jax.block_until_ready(st0.x_old)
_ = float(np.asarray(m.drag))
print(f'warmup 500 steps {time.time()-t0:.0f}s, its_last {int(m.gmres_iters)}',
      flush=True)

CANDS = [
    ('t32 w48 (recheck)  ', {}, 48),
    ('t32 w64            ', {}, 64),
    ('t48 w48            ', dict(tile_elements=48), 48),
    ('t64 w48            ', dict(tile_elements=64), 48),
    ('t32 w48 alloc16    ', dict(gmres_alloc=16), 48),
    ('t32 w48 (again)    ', {}, 48),
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
