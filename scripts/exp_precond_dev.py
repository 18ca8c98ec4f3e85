"""Preconditioner A/B at DEVELOPED shedding on the bench config.

Warms 500 steps once (tile path), snapshots the state, then times each
candidate configuration from the same developed state.  The right regime
for preconditioner decisions: iteration counts at the quiescent start
flatter weak configurations (docs/DESIGN.md, error-direction study).

Usage: python scripts/exp_precond_dev.py [timed_steps]
"""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from navier_stokes_equations_tpu.utils.platform import configure
configure()
import jax
import numpy as np

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
base = dataclasses.replace(
    test_cases.make('2D-2', deltat=0.01), dtype='float32', operator_path='tile'
)
s0 = solver.NavierStokesSolver(base, mesh)
st0 = s0.initial_state()
t0 = time.time()
st0, m = s0.run_async(500, state=st0, window=8)
jax.block_until_ready(st0.x_old)
_ = float(np.asarray(m.drag))
print(f'warmup 500 steps {time.time()-t0:.0f}s, its_last {int(m.gmres_iters)}',
      flush=True)

CANDS = {
    'default(p1c_mult,p1=2,cc)': {},
    'p1=4': dict(precond_p1_iters=4),
    'p1=1': dict(precond_p1_iters=1),
    'pcd': dict(precond_schur='pcd'),
    'pcd,p1=4': dict(precond_schur='pcd', precond_p1_iters=4),
    'alloc=16': dict(gmres_alloc=16),
    'alloc=32': dict(gmres_alloc=32),
    'kp_dense+p1=3': dict(precond_p1_iters=3),
}

for name, over in CANDS.items():
    cfg = dataclasses.replace(base, **over)
    s = solver.NavierStokesSolver(cfg, mesh)
    st = dataclasses.replace(
        st0, x_old=st0.x_old + 0, x_old_old=st0.x_old_old + 0
    )
    st, m = s.run_async(8, state=st, window=8)  # compile + settle
    jax.block_until_ready(st.x_old)
    _ = float(np.asarray(m.drag))
    t0 = time.time()
    st, m = s.run_async(N, state=st, window=8)
    jax.block_until_ready(st.x_old)
    _ = float(np.asarray(m.drag))
    dt_w = time.time() - t0
    print(f'{name:28s} {N/dt_w:6.2f} steps/s  its_last {int(m.gmres_iters):3d} '
          f'Cd {float(m.drag):.4f} conv {bool(m.converged)}', flush=True)
