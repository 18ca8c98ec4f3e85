"""Compare velocity-block preconditioners on one case/mesh (real hardware).

Usage:
    python scripts/precond_bench.py CASE MESH DT STEPS m1,m2,...
    # method spec: jacobi | chebyshev | nodeblock | p1coarse[:iters] | p1coarse_mult[:iters]

Prints one line per method: wall/step, Krylov its/step, Newton its/step, Cd.
"""
import dataclasses
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ns_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases


def main(argv):
    case, mesh_path, dt, steps = argv[0], argv[1], float(argv[2]), int(argv[3])
    methods = argv[4].split(",")
    warmup = int(argv[5]) if len(argv) > 5 else 0
    mesh = taylor_hood.load(mesh_path)
    st_warm = None
    if warmup:
        # March the flow into a developed state once (first method's config),
        # then time every method from the SAME state.
        cfg = dataclasses.replace(
            test_cases.make(case, deltat=dt), dtype="float32"
        )
        s0 = solver.NavierStokesSolver(cfg, mesh)
        st_warm = s0.initial_state()
        for k in range(warmup):
            st_warm, mw = s0.step(st_warm)
            if k % 100 == 0:
                print(f"  warmup {k}: Cd={float(mw.drag):.4f}", flush=True)
        del s0
    for meth in methods:
        over = {"dtype": "float32", "precond_vel_method": meth}
        if ":" in meth:
            m, it = meth.split(":")
            over = {
                "dtype": "float32",
                "precond_vel_method": m,
                "precond_p1_iters": int(it),
            }
        cfg = dataclasses.replace(test_cases.make(case, deltat=dt), **over)
        s = solver.NavierStokesSolver(cfg, mesh)
        st = s.initial_state()
        if st_warm is not None:
            import jax.numpy as jnp
            import jax as _jax
            st = _jax.tree.map(lambda a: jnp.array(a, copy=True), st_warm)
        st, m0 = s.step(st)  # compile + step 1
        _ = float(m0.drag)  # force execution (axon defers until first pull)
        t0 = time.perf_counter()
        its = nits = 0
        for _ in range(steps):
            # step() pulls all metrics in ONE stacked D2H transfer and
            # returns host scalars.
            st, m = s.step(st)
            its += m.gmres_iters
            nits += m.newton_iters
        wall = time.perf_counter() - t0
        print(
            f"[{meth}] {wall / steps:.3f} s/step  {its / steps:.1f} its/step  "
            f"{nits / steps:.1f} newton/step  Cd={float(m.drag):.4f}  "
            f"conv={bool(m.converged)}",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:])
