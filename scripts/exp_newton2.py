import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
rtol = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-4
cfg = dataclasses.replace(test_cases.make('2D-1'), dtype='float32', newton_rtol=rtol)
s = solver.NavierStokesSolver(cfg, mesh)
st = s.initial_state()
for i in range(6):
    t0 = time.time()
    st, m = s.step(st); jax.block_until_ready(m.drag)
    print(f'step {i+1}: {time.time()-t0:.1f}s newton {int(m.newton_iters)} gmres {int(m.gmres_iters)} res {float(m.residual):.3e} Cd {float(m.drag):.4f}', flush=True)
