"""Headline combo probe, stage 2: the last ~5% toward 15 steps/s.

From exp_headline_combo.py's winner (tile16, p1_iters=1, alloc=16, w24 =
14.33 steps/s) this measures: wider windows (free — host dispatch only),
a smaller Krylov allocation, replacing the dense K_p inverse (1.3 GB f32
streamed per Schur application at n_p=17,993) with the aggregation
two-grid, and a smaller tile size.

Usage: python scripts/exp_headline_combo2.py [timed_steps]
"""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from navier_stokes_equations_tpu.utils.platform import configure
configure()
import jax
import numpy as np

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100

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
    ('winner w24 (recheck)    ', {}, 24),
    ('w32                     ', {}, 32),
    ('w48                     ', {}, 48),
    ('alloc12 w24             ', dict(gmres_alloc=12), 24),
    ('kp twogrid w24          ', dict(precond_schur_dense_max=0), 24),
    ('tile8 w24               ', dict(tile_elements=8), 24),
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
    t0 = time.time()
    st, m = s.run_async(N, state=st, window=w)
    jax.block_until_ready(st.x_old)
    _ = float(np.asarray(m.drag))
    dt_w = time.time() - t0
    print(f'{name} {N/dt_w:6.2f} steps/s  its_last {int(m.gmres_iters):3d} '
          f'Cd {float(m.drag):.4f} conv {bool(m.converged)}', flush=True)
