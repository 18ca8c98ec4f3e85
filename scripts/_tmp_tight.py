import dataclasses, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ns_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from navier_stokes_equations_tpu.models import solver, test_cases

for meth, it, rtol in (("jacobi", 0, 1e-6), ("p1coarse_mult", 4, 1e-6)):
    over = {"dtype": "float32", "precond_vel_method": meth, "gmres_rtol": rtol}
    if it: over["precond_p1_iters"] = it
    cfg = dataclasses.replace(test_cases.make("3D-2Z", deltat=0.01), **over)
    s = solver.NavierStokesSolver(cfg, "meshes/mesh-3D-medium.msh")
    st = s.initial_state()
    its = 0
    for k in range(400):
        st, m = s.step(st)
        its += m.gmres_iters
        if (k+1) % 100 == 0:
            print(f"[{meth}@{rtol}] t={(k+1)*0.01:.1f} Cd={m.drag:.4f} its/step={its/(k+1):.1f}", flush=True)
