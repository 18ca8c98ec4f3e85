import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases

which = sys.argv[1] if len(sys.argv) > 1 else '2d'
if which == '2d':
    mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
    cfg = dataclasses.replace(test_cases.make('2D-2', deltat=0.01), dtype='float32')
else:
    mesh = taylor_hood.load('meshes/mesh-3D-medium.msh')
    cfg = dataclasses.replace(test_cases.make('3D-2Z', deltat=0.01), dtype='float32')
s = solver.NavierStokesSolver(cfg, mesh)
st = s.initial_state()
t0 = time.time()
st, m = s.step(st); jax.block_until_ready(m.drag)
print('step1 (compile+kp)', round(time.time()-t0,1), 's', flush=True)
for _ in range(5): st, m = s.step(st)
jax.block_until_ready(m.drag)
n = 60 if which == '2d' else 20
t0=time.time(); its=0
for i in range(n):
    st, m = s.step(st); its += int(m.gmres_iters)
jax.block_until_ready(m.drag)
dt=time.time()-t0
print(f'{which}: {n} steps {dt:.2f}s -> {n/dt:.2f} steps/s, avg_its {its/n:.1f}, Cd {float(m.drag):.4f}')
