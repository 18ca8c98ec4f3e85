"""Quick smoke run of the time loop on CPU/f64 (not a test)."""

import os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from navier_stokes_equations_tpu.models import solver, test_cases

case = sys.argv[1] if len(sys.argv) > 1 else "2D-1"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
mesh = sys.argv[3] if len(sys.argv) > 3 else "/root/reference/meshes/mesh-2D.msh"

cfg = test_cases.make(case)
cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float64"})
s = solver.NavierStokesSolver(cfg, mesh)
print(f"case={case} dt={s.dt0} nu={s.nu:.6g} n_dofs={s.fe.n_dofs} n_el={s.fe.n_el}")

state = s.initial_state()
state, hist = s.run(n_steps=n, state=state)
for r in hist:
    print(
        f"step {r['step']:4d} t={r['time']:.3f} Cd={r['Cd']:+.5f} Cl={r['Cl']:+.5f} "
        f"dP={r['DeltaP']:+.5f} gmres={r['gmres_iters']:4d} newton={r['newton_iters']} "
        f"conv={int(r['converged'])} wall={r['wall']*1e3:7.1f} ms"
    )
