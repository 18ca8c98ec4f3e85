"""2D-1 Newton rung probes, round 3b (target: >=1.0 steps/s, 13x).

Round-3a measured (60 steps, mesh-2D-100, dt=0.1, f32, TPU v5e):
  fixed,quad 0.571 | ew,quad 0.875 | fixed,tile 0.513 | ew,tile 0.771
  (EW cuts krylov_tot 2086 -> 1259 at +35% Newton iterations)

One candidate per invocation so a diverging/slow config can't eat the
window:

    timeout 1200 python scripts/exp_newton2.py NAME [key=val ...]
"""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from navier_stokes_equations_tpu.utils.platform import configure
configure()
import jax
import numpy as np

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases

name = sys.argv[1]
over = {}
for kv in sys.argv[2:]:
    k, v = kv.split('=', 1)
    try:
        v = int(v)
    except ValueError:
        try:
            v = float(v)
        except ValueError:
            pass
    over[k] = v
n_steps = int(over.pop('nsteps', 60))

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
cfg = dataclasses.replace(
    test_cases.make('2D-1', deltat=0.1), dtype='float32',
    newton_forcing='ew', **over,
)
s = solver.NavierStokesSolver(cfg, mesh)
st = s.initial_state()
st, m = s.run_async(2, state=st, window=1)  # compile + settle
jax.block_until_ready(st.x_old)
_ = float(np.asarray(m.drag))
kry = new = 0
t0 = time.time()
st, m = s.run_async(n_steps, state=st, window=1)
jax.block_until_ready(st.x_old)
_ = float(np.asarray(m.drag))
dt_w = time.time() - t0
print(f'{name:26s} {n_steps/dt_w:6.3f} steps/s  newton_last '
      f'{int(m.newton_iters):3d} gmres_last {int(m.gmres_iters):4d} '
      f'Cd {float(m.drag):.4f} conv {bool(m.converged)}', flush=True)
