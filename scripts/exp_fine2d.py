import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from navier_stokes_equations_tpu.mesh import generators, taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases

print('building mesh...', flush=True)
mesh = taylor_hood.build(generators.channel_cylinder_2d(0.028, 0.0015))
cfg = dataclasses.replace(test_cases.make('2D-2', deltat=0.0025), dtype='float32')
t0 = time.time()
s = solver.NavierStokesSolver(cfg, mesh)
print(f'setup {time.time()-t0:.0f}s; n_dofs {s.fe.n_dofs} n_p {s.fe.n_p} '
      f'schur: dense={s.pressure_ops.dense} twolevel={s.pressure_ops.two_level} '
      f'n_c={s.pressure_ops.kc_inv.shape[0] if s.pressure_ops.two_level else "-"}', flush=True)
st = s.initial_state()
t0 = time.time()
st, m = s.step(st); jax.block_until_ready(m.drag)
print('step1 (compile)', round(time.time()-t0,1), 's its', int(m.gmres_iters), flush=True)
for _ in range(5): st, m = s.step(st)
jax.block_until_ready(m.drag)
t0=time.time(); its=0
n=30
for i in range(n):
    st, m = s.step(st); its += int(m.gmres_iters)
jax.block_until_ready(m.drag)
dt=time.time()-t0
print(f'{n} steps {dt:.1f}s -> {n/dt:.2f} steps/s, avg_its {its/n:.1f}, Cd {float(m.drag):.4f}')
