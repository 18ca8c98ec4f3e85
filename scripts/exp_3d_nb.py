import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
mesh = taylor_hood.load('meshes/mesh-3D-medium.msh')
cfg = dataclasses.replace(test_cases.make('3D-2Z', deltat=0.01), dtype='float32',
                          precond_vel_method='nodeblock')
s = solver.NavierStokesSolver(cfg, mesh)
st = s.initial_state()
st, m = s.step(st); jax.block_until_ready(m.drag)
for _ in range(4): st, m = s.step(st)
jax.block_until_ready(m.drag)
t0=time.time(); its=0
for i in range(20):
    st, m = s.step(st); its += int(m.gmres_iters)
jax.block_until_ready(m.drag)
dt=time.time()-t0
print(f'nodeblock: {20/dt:.2f} steps/s, avg_its {its/20:.1f}, Cd {float(m.drag):.4f}, conv {bool(m.converged)}')
