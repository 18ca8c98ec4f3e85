"""Measure run_async windowed dispatch vs per-step pulls (axon TPU)."""
import dataclasses
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ns_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from navier_stokes_equations_tpu.models import solver, test_cases


def main():
    cfg = dataclasses.replace(test_cases.make("2D-2", deltat=0.01), dtype="float32")
    s = solver.NavierStokesSolver(cfg, "/root/reference/meshes/mesh-2D-100.msh")
    st = s.initial_state()
    st, _ = s.run_async(500, st)  # developed flow
    for w in (1, 2, 4, 8):
        t0 = time.perf_counter()
        st, m = s.run_async(100, st, window=w)
        dt = time.perf_counter() - t0
        print(f"[window={w}] {dt/100*1000:.1f} ms/step  ({100/dt:.2f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
