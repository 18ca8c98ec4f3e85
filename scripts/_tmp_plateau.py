import dataclasses, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ns_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from navier_stokes_equations_tpu.models import solver, test_cases

for meth, it in (("jacobi", 0), ("p1coarse_mult", 4)):
    over = {"dtype": "float32", "precond_vel_method": meth}
    if it: over["precond_p1_iters"] = it
    cfg = dataclasses.replace(test_cases.make("3D-2Z", deltat=0.01), **over)
    s = solver.NavierStokesSolver(cfg, "meshes/mesh-3D-medium.msh")
    st = s.initial_state()
    t0 = time.time(); its = 0
    for k in range(800):
        st, m = s.step(st)
        if (k+1) % 100 == 0:
            print(f"[{meth}] t={(k+1)*0.01:.1f} Cd={float(m.drag):.4f}", flush=True)
    print(f"[{meth}] 800 steps in {time.time()-t0:.0f}s", flush=True)
