"""Headline probe: per-candidate subprocess timing from a shared warm state.

Round-2's monolithic sweep (exp_precond_dev.py) lost the whole window when
one candidate diverged/hung.  This splits the sweep:

    python scripts/exp_headline.py warm            # 500-step warmup -> npz
    timeout 900 python scripts/exp_headline.py cand NAME [key=val ...]

so the driver loop can bound each candidate independently.  The warm state
is the bench config (2D-2, mesh-2D-100, dt=0.01, tile path, tile_e=16);
candidates restart from the same developed-shedding snapshot.
"""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from navier_stokes_equations_tpu.utils.platform import configure
configure()
import jax
import numpy as np

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.utils import checkpoint

WARM = '/tmp/bench_warm_2d2.npz'

def base_cfg(**over):
    return dataclasses.replace(
        test_cases.make('2D-2', deltat=0.01), dtype='float32',
        operator_path='tile', tile_elements=16, **over)

def parse(kvs):
    out = {}
    for kv in kvs:
        k, v = kv.split('=', 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        out[k] = v
    return out

def main():
    mode = sys.argv[1]
    mesh = taylor_hood.load('/root/reference/meshes/mesh-2D-100.msh')
    if mode == 'warm':
        s = solver.NavierStokesSolver(base_cfg(), mesh)
        st = s.initial_state()
        t0 = time.time()
        st, m = s.run_async(500, state=st, window=8)
        jax.block_until_ready(st.x_old)
        _ = float(np.asarray(m.drag))
        checkpoint.save(WARM, st)
        print(f'warm 500 steps {time.time()-t0:.0f}s its_last {int(m.gmres_iters)}',
              flush=True)
        return 0
    name = sys.argv[2]
    over = parse(sys.argv[3:])
    window = int(over.pop('window', 8))
    nsteps = int(over.pop('nsteps', 60))
    cfg = base_cfg(**over)
    s = solver.NavierStokesSolver(cfg, mesh)
    st, _ = checkpoint.load(WARM, dtype=cfg.np_dtype())
    st, m = s.run_async(8, state=st, window=window)  # compile + settle
    jax.block_until_ready(st.x_old)
    _ = float(np.asarray(m.drag))
    t0 = time.time()
    st, m = s.run_async(nsteps, state=st, window=window)
    jax.block_until_ready(st.x_old)
    _ = float(np.asarray(m.drag))
    dt_w = time.time() - t0
    print(f'{name:30s} {nsteps/dt_w:6.2f} steps/s  its_last {int(m.gmres_iters):3d} '
          f'Cd {float(m.drag):.4f} conv {bool(m.converged)}', flush=True)
    return 0

if __name__ == '__main__':
    sys.exit(main())
