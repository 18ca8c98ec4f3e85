import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases

mesh = taylor_hood.load('meshes/mesh-3D-medium.msh')
cfg = dataclasses.replace(test_cases.make('3D-2Z', deltat=0.01), dtype='float32')
s = solver.NavierStokesSolver(cfg, mesh)
print('n_el', s.fe.n_el, 'n_dofs', s.fe.n_dofs, 'n_p', s.fe.n_p,
      'dense_schur', s.pressure_ops.dense, flush=True)
st = s.initial_state()
t0 = time.time()
st, m = s.step(st); jax.block_until_ready(m.drag)
print('step1 (incl compile)', round(time.time()-t0, 1), 's conv', bool(m.converged),
      'its', int(m.gmres_iters), flush=True)
for _ in range(4): st, m = s.step(st)
jax.block_until_ready(m.drag)
t0 = time.time()
for i in range(20): st, m = s.step(st)
jax.block_until_ready(m.drag)
dt = time.time()-t0
print('20 steps', round(dt, 2), '->', round(20/dt, 2), 'steps/s, its_last',
      int(m.gmres_iters), 'Cd', round(float(m.drag), 4))
