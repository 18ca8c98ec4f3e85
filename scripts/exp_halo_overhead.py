"""Halo-layout overhead vs the single-chip path (CPU timing study).

VERDICT round-3 stretch item: the halo layout's cost had only correctness
gates, not a measured cost model.  No multi-chip TPU hardware is reachable
from this environment, so this study times the FULL halo time loop on a
virtual N-device CPU mesh against the single-chip solver in the SAME
process / same backend, isolating the layout + shard_map + ppermute
overhead from everything the two paths share (weak form, Krylov algebra,
physics).  ``--operator-path tile`` times the round-4 distributed tile
operator (parallel/halo_tiles.py) on both layouts.

What transfers to TPU and what does not:
  * transfers: the RELATIVE per-step overhead decomposition (extra
    collective launches per Krylov iteration, per-strip padding waste,
    duplicated interface work) — these are layout properties;
  * does not: absolute times (CPU "devices" are threads sharing one
    memory system; ppermute is a memcpy, not an ICI hop).

Run:  python scripts/exp_halo_overhead.py [--mesh PATH] [--steps N]
"""

import argparse
import os
import sys
import time

# --platform tpu (VERDICT round-4 item 4): anchor the CPU-derived overhead
# model with a REAL-chip number.  Only n_shards=1 is measurable on the one
# available chip, but that is exactly the layout's fixed overhead (halo
# padding, shard_map program structure, ppermute no-ops) — the part the
# cost model extrapolates from.
_TPU = "--platform" in sys.argv and "tpu" in sys.argv
if not _TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

if _TPU:
    jax.config.update("jax_compilation_cache_dir", "/tmp/ns_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
else:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.parallel import halo_solver, sharding


def time_loop(s, state, n_warm, n_time):
    for _ in range(n_warm):
        state, m = s.step(state)
    jax.block_until_ready(state.x_old)
    # On axon-tunneled TPU, execution is DEFERRED until a device->host
    # pull — pull a scalar so the warmup really ran before the timer
    # starts.  (On CPU this is a harmless no-op read.)
    float(m.drag)
    t0 = time.perf_counter()
    iters = []
    for _ in range(n_time):
        state, m = s.step(state)
        iters.append(m.gmres_iters)
    # ONE stacked pull closes the timed window (a per-step int() pull
    # would add a ~30-40 ms axon round-trip to every step and swamp the
    # per-step cost on the real chip); the pull also forces the deferred
    # execution, so the timer covers the actual device work.
    total_iters = int(jnp.sum(jnp.stack(iters)))
    dt = time.perf_counter() - t0
    return dt / n_time, total_iters / n_time, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="/root/reference/meshes/mesh-2D.msh")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--warm", type=int, default=4)
    ap.add_argument("--shards", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                    help="tpu = time on the real chip (n_shards=1 only)")
    ap.add_argument(
        "--operator-path", default="quadrature",
        choices=["quadrature", "tile"],
        help="operator evaluation on BOTH layouts (the round-4 halo tile "
        "path makes the assembled operator available multi-chip)",
    )
    args = ap.parse_args()

    cfg = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01), dtype="float32",
        operator_path=args.operator_path, tile_resident=False)
    mesh = sharding.partition_mesh(taylor_hood.load(args.mesh), 8)
    print(f"mesh {args.mesh}: {mesh.n_vertices} verts, "
          f"{mesh.n_el_real} elems", flush=True)

    ref = solver.NavierStokesSolver(cfg, mesh)
    t_ref, its_ref, _ = time_loop(ref, ref.initial_state(),
                                  args.warm, args.steps)
    print(f"single-chip ({args.operator_path[:4]} path)   "
          f"{t_ref * 1e3:9.1f} ms/step   {its_ref:5.1f} its/step",
          flush=True)

    for n in args.shards:
        try:
            hs = halo_solver.HaloNavierStokesSolver(cfg, mesh, n_shards=n)
            t_h, its_h, _ = time_loop(hs, hs.initial_state(),
                                      args.warm, args.steps)
        except Exception as e:  # noqa: BLE001 - report and continue study
            print(f"halo n_shards={n}: FAILED ({type(e).__name__}: {e})",
                  flush=True)
            continue
        print(f"halo n_shards={n}        {t_h * 1e3:9.1f} ms/step   "
              f"{its_h:5.1f} its/step   overhead x{t_h / t_ref:5.2f}",
              flush=True)


if __name__ == "__main__":
    main()
