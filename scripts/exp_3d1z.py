import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
mesh = taylor_hood.load('meshes/mesh-3D-medium.msh')
cfg = dataclasses.replace(test_cases.make('3D-1Z', deltat=0.01), dtype='float32')
s = solver.NavierStokesSolver(cfg, mesh)
print('dt', s.dt0, 'n_dofs', s.fe.n_dofs, flush=True)
st = s.initial_state()
t0 = time.time()
st, m = s.step(st); jax.block_until_ready(m.drag)
print('step1', round(time.time()-t0,1), 's newton', int(m.newton_iters), 'gmres', int(m.gmres_iters), flush=True)
t0=time.time()
for i in range(5):
    st, m = s.step(st)
jax.block_until_ready(m.drag)
dt=time.time()-t0
print(f'5 steps {dt:.1f}s -> {5/dt:.3f} steps/s, newton {int(m.newton_iters)}, Cd {float(m.drag):.4f}')
