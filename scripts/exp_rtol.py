import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses, numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
base = dataclasses.replace(test_cases.make('2D-2', deltat=0.01), dtype='float32')

def run(rtol, n=250):
    cfg = dataclasses.replace(base, gmres_rtol=rtol)
    s = solver.NavierStokesSolver(cfg, mesh)
    st = s.initial_state()
    st, m = s.step(st); jax.block_until_ready(m.drag)
    hist = []
    t0 = time.time()
    its = 0
    for i in range(n):
        st, m = s.step(st)
        its += int(m.gmres_iters)
        if (i + 1) % 50 == 0:
            hist.append((float(m.time), float(m.drag), float(m.lift), float(m.delta_p)))
    wall = time.time() - t0
    print(f'rtol={rtol:g}: {n/wall:.2f} steps/s, avg_its={its/n:.1f}')
    for h in hist:
        print(f'  t={h[0]:.2f} Cd={h[1]:.6f} Cl={h[2]:.6f} dP={h[3]:.6f}')
    return hist

h4 = run(1e-4)
h2 = run(1e-2)
h3 = run(3e-3)
for tag, h in [('1e-2', h2), ('3e-3', h3)]:
    err = max(abs(a[1]-b[1]) + abs(a[3]-b[3]) for a, b in zip(h4, h))
    print(f'max |dCd|+|ddP| vs 1e-4 for rtol {tag}: {err:.2e}')
