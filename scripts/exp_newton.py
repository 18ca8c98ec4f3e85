import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
cfg = dataclasses.replace(test_cases.make('2D-1'), dtype='float32')
s = solver.NavierStokesSolver(cfg, mesh)
print('dt', s.dt0)
st = s.initial_state()
t0 = time.time()
st, m = s.step(st); jax.block_until_ready(m.drag)
print('step1', round(time.time()-t0,1), 's newton_its', int(m.newton_iters), 'gmres', int(m.gmres_iters), flush=True)
t0=time.time(); nit=0; git=0
n=10
for i in range(n):
    st, m = s.step(st); nit += int(m.newton_iters); git += int(m.gmres_iters)
jax.block_until_ready(m.drag)
dt=time.time()-t0
print(f'{n} steps {dt:.2f}s -> {n/dt:.2f} steps/s, newton/step {nit/n:.1f}, gmres/step {git/n:.1f}, Cd {float(m.drag):.4f}')
