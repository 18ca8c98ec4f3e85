"""Round-4 headline probes: the last ~10% toward >=15 steps/s (>=50x).

Baseline = the round-3 bench config (tile16, p1_iters=1, alloc=16, w24;
BENCH_r03 = 13.64, probe band 13.1-14.3).  Candidates, in order of the
VERDICT's expectations:
  * extrap_u warm start  — velocity-only extrapolated Krylov start
    (pressure held at p^n); the measured lever is the ~6 its/step.
  * wider windows w32/w48 — host-dispatch amortization, no device change.
  * alloc=12             — smaller CGS2 projection traffic.
  * K_p two-grid         — replaces the 1.3 GB dense K_p^-1 HBM stream
    per Schur application (n_p=17,993).
  * tile8                — smaller tile, less slot padding.
Each candidate resumes from ONE developed-flow snapshot (t=5) and times
N steps twice (the run-to-run band is +-10%; we report both).

Usage: python scripts/exp_headline_r4.py [timed_steps]
"""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from navier_stokes_equations_tpu.utils.platform import configure
configure()
import jax
import numpy as np

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100

mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
base = dataclasses.replace(
    test_cases.make('2D-2', deltat=0.01), dtype='float32',
    operator_path='tile', tile_elements=16,
    precond_p1_iters=1, gmres_alloc=16,
)
s0 = solver.NavierStokesSolver(base, mesh)
st0 = s0.initial_state()
t0 = time.time()
st0, m = s0.run_async(500, state=st0, window=24)
jax.block_until_ready(st0.x_old)
_ = float(np.asarray(m.drag))
print(f'warmup 500 steps {time.time()-t0:.0f}s, its_last {int(m.gmres_iters)}',
      flush=True)

CANDS = [
    ('bench w24 (recheck)     ', {}, 24),
    ('extrap_u w24            ', dict(gmres_warm_start_mode='extrap_u'), 24),
    ('w32                     ', {}, 32),
    ('w48                     ', {}, 48),
    ('alloc12 w24             ', dict(gmres_alloc=12), 24),
    ('kp twogrid w24          ', dict(precond_schur_dense_max=0), 24),
    ('tile8 w24               ', dict(tile_elements=8), 24),
]

results = {}
for name, over, w in CANDS:
    cfg = dataclasses.replace(base, **over)
    s = solver.NavierStokesSolver(cfg, mesh)
    st = dataclasses.replace(
        st0, x_old=st0.x_old + 0, x_old_old=st0.x_old_old + 0
    )
    st, m = s.run_async(2 * w, state=st, window=w)  # compile + settle
    jax.block_until_ready(st.x_old)
    _ = float(np.asarray(m.drag))
    rates = []
    for _rep in range(2):
        t0 = time.time()
        st, m = s.run_async(N, state=st, window=w)
        jax.block_until_ready(st.x_old)
        _ = float(np.asarray(m.drag))
        rates.append(N / (time.time() - t0))
    results[name.strip()] = rates
    print(f'{name} {rates[0]:6.2f} / {rates[1]:6.2f} steps/s   '
          f'its_last {int(m.gmres_iters):3d}  Cd {float(np.asarray(m.drag)):.3f}',
          flush=True)

print({k: [round(r, 2) for r in v] for k, v in results.items()})
