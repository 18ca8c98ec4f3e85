"""2D-1 Newton perf A/B: fixed vs Eisenstat-Walker forcing x operator path.

The weakest perf rung (VERDICT round 2: 0.48 steps/s, 6.5x) burns ~94
Krylov its/step at the fixed 1e-2 inner tolerance.  Measures steps/s and
total Krylov iterations over N steps from the quiescent start (the 2D-1
run IS the transient toward steady state — no developed-state snapshot
makes sense here).

Usage: python scripts/exp_newton_ew.py [N]
"""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from navier_stokes_equations_tpu.utils.platform import configure
configure()
import jax
import numpy as np

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
base = dataclasses.replace(
    test_cases.make('2D-1', deltat=0.1), dtype='float32'
)

CANDS = {
    'fixed,quad': {},
    'ew,quad': dict(newton_forcing='ew'),
    # Round-4: te=32 + auto (RCB) clustering is the headline tiling.
    'ew,tile': dict(newton_forcing='ew', operator_path='tile',
                    tile_elements=32),
    # Round-4: modified Newton — freeze the Jacobian/preconditioner for
    # k-1 iterations (fresh residual; config.newton_jacobian_reuse).
    'ew,tile,reuse3': dict(newton_forcing='ew', operator_path='tile',
                           tile_elements=32, newton_jacobian_reuse=3),
    'ew,tile,reuse6': dict(newton_forcing='ew', operator_path='tile',
                           tile_elements=32, newton_jacobian_reuse=6),
}
if os.environ.get('NEWTON_EW_ALL'):
    CANDS['fixed,tile'] = dict(operator_path='tile', tile_elements=32)
    CANDS['ew,quad,p1=4'] = dict(newton_forcing='ew', precond_p1_iters=4)

for name, over in CANDS.items():
    cfg = dataclasses.replace(base, **over)
    s = solver.NavierStokesSolver(cfg, mesh)
    st = s.initial_state()
    st, m = s.step(st)  # compile
    tot_its = int(m.gmres_iters)
    tot_newton = int(m.newton_iters)
    t0 = time.time()
    for _ in range(N):
        st, m = s.step(st)
        tot_its += int(m.gmres_iters)
        tot_newton += int(m.newton_iters)
    jax.block_until_ready(st.x_old)
    dt_w = time.time() - t0
    print(f'{name:18s} {N/dt_w:6.3f} steps/s  krylov_tot {tot_its:5d} '
          f'newton_tot {tot_newton:3d} Cd {float(m.drag):.4f} '
          f'conv {bool(m.converged)}', flush=True)
