"""Entry-point JAX platform configuration shared by main.py / bench.py /
__graft_entry__ / scripts.

Two settings every TPU run needs:

* Persistent compilation cache — first TPU compile of a full step program
  takes minutes; the cache makes reruns seconds.
* ``jax_default_matmul_precision = "highest"`` — XLA:TPU's DEFAULT matmul
  precision evaluates f32 dots in bfloat16 passes.  For this solver that is
  not a benign speed knob: the assembly/operator einsums pick up ~1e-3
  relative noise per application, which (a) floors the attainable Newton
  residual ~6000x above the true f32 floor (measured on 2D-1: the damped
  iteration stalls at ||R||/||R0|| ~ 0.18 and the honest stall exit reports
  non-convergence) and (b) makes warm-started FGMRES unable to SEE
  convergence below the noise, wasting Krylov iterations.  Measured on
  2D-2 mesh-2D-100: pre-developed flow 8 its/step at DEFAULT vs 2-3 at
  HIGHEST (>2x faster); developed shedding 9 its vs 6, bench 5.82 -> 6.32
  steps/s (+9%) — the 6-pass f32 MXU arithmetic costs less than the extra
  Krylov iterations everywhere we measured.  ``"high"`` (3 passes) is a
  wash: ~7% cheaper per iteration, but it gives back an iteration in
  developed flow and shifts Cd by ~3e-3 vs the HIGHEST/f64 trajectory.
  CPU runs are unaffected (always full precision).
"""

from __future__ import annotations


def configure(cache: bool = True, precision: str = "highest") -> None:
    import jax

    if cache:
        try:
            jax.config.update("jax_compilation_cache_dir", "/tmp/ns_tpu_jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        except Exception:
            pass
    if precision:
        try:
            jax.config.update("jax_default_matmul_precision", precision)
        except Exception:
            pass
