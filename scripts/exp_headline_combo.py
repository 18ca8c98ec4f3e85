"""Headline combo probe: p1_iters x gmres_alloc x tile_e x window.

Round-3 follow-up to exp_precond_dev.py, which found p1_iters=1 (+15%)
and alloc=16 (+2%) at tile_e=32.  This measures the combinations at the
bench config (tile_e=16) from one developed-flow snapshot.  NOTE: bench.py
now defaults to p1_iters=1 / gmres_alloc=16 / window=24 (this probe's
winner), so the warmup below compiles the OLD default (p1=2/alloc=64)
program, not the current bench program.

Usage: python scripts/exp_headline_combo.py [timed_steps]
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
)
s0 = solver.NavierStokesSolver(base, mesh)
st0 = s0.initial_state()
t0 = time.time()
st0, m = s0.run_async(500, state=st0, window=8)
jax.block_until_ready(st0.x_old)
_ = float(np.asarray(m.drag))
print(f'warmup 500 steps {time.time()-t0:.0f}s, its_last {int(m.gmres_iters)}',
      flush=True)

CANDS = [
    ('tile16 default w8          ', {}, 8),
    ('tile16 p1=1 w8             ', dict(precond_p1_iters=1), 8),
    ('tile16 p1=1 alloc16 w8     ', dict(precond_p1_iters=1, gmres_alloc=16), 8),
    ('tile16 p1=1 alloc16 w16    ', dict(precond_p1_iters=1, gmres_alloc=16), 16),
    ('tile16 p1=1 alloc16 w24    ', dict(precond_p1_iters=1, gmres_alloc=16), 24),
    ('tile32 p1=1 alloc16 w16    ', dict(precond_p1_iters=1, gmres_alloc=16,
                                         tile_elements=32), 16),
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
