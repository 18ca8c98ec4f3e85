import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from navier_stokes_equations_tpu.mesh import generators, taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
mesh = taylor_hood.build(generators.channel_cylinder_2d(0.028, 0.0015))
cfg = dataclasses.replace(test_cases.make('2D-2', deltat=0.0025), dtype='float32',
                          precond_vel_method='chebyshev', precond_vel_degree=6)
s = solver.NavierStokesSolver(cfg, mesh)
st = s.initial_state()
st, m = s.step(st); jax.block_until_ready(m.drag)
for _ in range(5): st, m = s.step(st)
jax.block_until_ready(m.drag)
t0=time.time(); its=0
n=20
for i in range(n):
    st, m = s.step(st); its += int(m.gmres_iters)
jax.block_until_ready(m.drag)
dt=time.time()-t0
print(f'cheb6: {n/dt:.2f} steps/s, avg_its {its/n:.1f}')
