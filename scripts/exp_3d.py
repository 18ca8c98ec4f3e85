"""Round-stamped 3D-2Z headline benchmark (the 3D analog of bench.py).

Emits ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
221k-dof 3D-2Z case (mesh-3D-medium, SUPG, dt=0.01) so the README's 3D
steps/s claim is reproducible and drift-visible round over round:

    python scripts/exp_3d.py --out BENCH3D_r05.json

Protocol mirrors bench.py: warm up past the inlet ramp knee into the
worked regime, then median of 3 independently timed windows of windowed
async dispatch (one stacked metrics pull per window — D2H round-trips on
the tunneled device are ~30-40 ms each).  Reference baseline: 0.083
steps/s on this case class (BASELINE.md; the reference PDF's own 3D
timing, 12 s/step at 221k dofs).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_3D_STEPS_PER_SEC = 0.083


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write the JSON line here")
    ap.add_argument("--warmup", type=int, default=int(os.environ.get("B3D_WARMUP", "420")))
    ap.add_argument("--timed", type=int, default=int(os.environ.get("B3D_TIMED", "60")))
    ap.add_argument("--reps", type=int, default=int(os.environ.get("B3D_REPS", "3")))
    ap.add_argument("--window", type=int, default=int(os.environ.get("B3D_WINDOW", "20")))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ns_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from navier_stokes_equations_tpu.mesh import taylor_hood
    from navier_stokes_equations_tpu.models import solver, test_cases

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mesh = taylor_hood.load(os.path.join(repo, "meshes/mesh-3D-medium.msh"))
    cfg = dataclasses.replace(test_cases.make("3D-2Z", deltat=0.01), dtype="float32")
    s = solver.NavierStokesSolver(cfg, mesh)
    print(f"# n_dofs={s.fe.n_dofs} n_el={s.fe.n_el} "
          f"dense_schur={s.pressure_ops.dense}", file=sys.stderr)

    state = s.initial_state()
    t0 = time.perf_counter()
    state, m = s.run_async(args.warmup, state, window=args.window)
    jax.block_until_ready(m.drag)
    print(f"# warmup {args.warmup} steps (incl compile) "
          f"{time.perf_counter() - t0:.1f}s t={float(state.time):.2f}",
          file=sys.stderr)

    rates = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        state, m = s.run_async(args.timed, state, window=args.window)
        jax.block_until_ready(m.drag)
        rates.append(args.timed / (time.perf_counter() - t0))
    rates.sort()
    sps = rates[len(rates) // 2]
    print(f"# physics: Cd={float(m.drag):.4f} Cl={float(m.lift):.4f} "
          f"dP={float(m.delta_p):.4f} t_end={float(state.time):.2f} "
          f"its_last={int(m.gmres_iters)} "
          f"windows={[round(r, 2) for r in rates]}", file=sys.stderr)
    result = {
        "metric": f"3D-2Z steps/sec (mesh-3D-medium 221k dofs, SUPG, dt=0.01, "
                  f"post-ramp, {jax.devices()[0].platform})",
        "value": round(sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(sps / BASELINE_3D_STEPS_PER_SEC, 2),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
