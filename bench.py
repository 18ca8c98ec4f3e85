#!/usr/bin/env python3
"""Headline benchmark: 2D-2 (DFG unsteady Re=100) time-steps/sec on one chip.

Baseline: the reference deal.II/Trilinos/MPI solver runs 2D-2 at ~3.2 s per
dt=0.01 step (~0.31 steps/s) on a 6-core Ryzen 7600X (BASELINE.md, report
PDF section 5.2).  This script times the same physics — CN + Oseen, FGMRES +
Cahouet-Chabard, drag/lift/dp every step — on the finest committed mesh
(mesh-2D-100, 17,993 vertices; falls back to a generated equivalent), in the
developed-flow regime (warmup past the inlet ramp), using the scan-driven
step loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Resilience (the round-2 number was lost to a transient backend outage):
the default invocation is an ORCHESTRATOR that (1) terminates stale TPU
clients from this repo (one-client-at-a-time device), (2) probes the device
with a trivial matmul in a THROWAWAY subprocess, retrying with backoff
(a wedged worker often recovers in 90-210 s), and (3) runs the measurement
itself in a fresh subprocess, retrying on backend-init/unavailable errors.
``bench.py --inner`` is the raw single-attempt measurement.
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
import subprocess
import sys
import time

BASELINE_STEPS_PER_SEC = 0.31  # reference 2D-2, 4-rank MPI CPU (BASELINE.md)

# Signatures of a transient device/backend failure (worth retrying) as seen
# on the axon-tunneled TPU: init refusal, wedged worker, mid-run loss.
_TRANSIENT_SIGNS = (
    "Unable to initialize backend",
    "UNAVAILABLE",
    "FAILED_PRECONDITION",
    "DEADLINE_EXCEEDED",
    "crashed or restarted",
    "Socket closed",
)


def _enable_compilation_cache():
    """Compile cache + full-precision f32 matmuls (utils/platform.py:
    DEFAULT TPU matmul precision is bf16 passes — noisier physics AND
    slower end-to-end, because FGMRES burns iterations below the noise)."""
    from navier_stokes_equations_tpu.utils.platform import configure

    configure()


# ---------------------------------------------------------------------------
# Orchestrator: make the benchmark survive transient TPU outages.
# ---------------------------------------------------------------------------


def _candidate_stale_clients() -> list[int]:
    """PIDs of OTHER python processes that look like TPU clients of this repo.

    The device accepts one client at a time; a stale ``main.py``/script left
    over from an interrupted session blocks (or wedges) initialization.  We
    match only this repo's entry points, and never our own process tree.
    """
    markers = ("bench.py", "main.py", "validate.py", "__graft_entry__",
               "/root/repo/scripts/")
    protected = set()
    pid = os.getpid()
    # Protect self and every ancestor (the driver shell invoking us).
    while pid > 1:
        protected.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split(")")[-1].split()[1])
        except Exception:
            break
    out = []
    try:
        pids = [int(p) for p in os.listdir("/proc") if p.isdigit()]
    except Exception:
        return out
    for p in pids:
        if p in protected:
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ").decode("utf-8", "replace")
        except Exception:
            continue
        if "python" not in cmd:
            continue
        if any(m in cmd for m in markers):
            out.append(p)
    return out


def _reap_stale_clients() -> None:
    stale = _candidate_stale_clients()
    for p in stale:
        try:
            os.kill(p, signal.SIGTERM)
            print(f"# bench: SIGTERM stale TPU client pid={p}", file=sys.stderr)
        except OSError:
            pass
    if stale:
        time.sleep(5.0)
        for p in stale:
            try:
                os.kill(p, signal.SIGKILL)
            except OSError:
                pass
        time.sleep(3.0)


_PROBE_SRC = """
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.float32)
v = float((x @ x).sum())
assert v == 256.0 * 256 * 256, v
print("PROBE_OK", jax.devices()[0].platform)
"""


def _probe_device(timeout_s: float = 240.0) -> bool:
    """Trivial matmul + scalar pull in a throwaway subprocess.

    A wedged backend can HANG client init (not just error), so the probe
    must be separate from the process that will run the measurement.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        )
    except subprocess.TimeoutExpired:
        print("# bench: probe TIMED OUT (wedged client init)", file=sys.stderr)
        return False
    if r.returncode == 0 and "PROBE_OK" in r.stdout:
        print(f"# bench: probe ok ({r.stdout.strip().split()[-1]})", file=sys.stderr)
        return True
    tail = (r.stderr or r.stdout or "").strip().splitlines()[-3:]
    print("# bench: probe failed: " + " | ".join(tail), file=sys.stderr)
    return False


def _orchestrate() -> int:
    deadline = time.monotonic() + float(os.environ.get("BENCH_RETRY_DEADLINE", "1500"))
    inner_timeout = float(os.environ.get("BENCH_INNER_TIMEOUT", "2700"))
    backoff = 60.0
    attempt = 0
    _reap_stale_clients()
    while True:
        attempt += 1
        if _probe_device():
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--inner"],
                    capture_output=True, text=True, timeout=inner_timeout,
                    cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
                )
            except subprocess.TimeoutExpired:
                r = None
                print(f"# bench: inner run timed out after {inner_timeout:.0f}s",
                      file=sys.stderr)
            if r is not None:
                sys.stderr.write(r.stderr)
                json_line = None
                for line in r.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        json_line = line
                    elif line:
                        print(line, file=sys.stderr)
                if r.returncode == 0 and json_line:
                    print(json_line)
                    return 0
                blob = (r.stderr or "") + (r.stdout or "")
                transient = any(s in blob for s in _TRANSIENT_SIGNS)
                print(f"# bench: inner attempt {attempt} failed rc={r.returncode} "
                      f"transient={transient}", file=sys.stderr)
                if not transient:
                    # A real bug: retrying the same code cannot help.
                    return 1
        if time.monotonic() + backoff > deadline:
            print("# bench: retry deadline exhausted; device still unavailable",
                  file=sys.stderr)
            return 1
        print(f"# bench: backing off {backoff:.0f}s before retry", file=sys.stderr)
        time.sleep(backoff)
        backoff = min(backoff * 1.5, 300.0)
        _reap_stale_clients()


# ---------------------------------------------------------------------------
# The measurement itself (single attempt).
# ---------------------------------------------------------------------------


def main():
    import jax

    _enable_compilation_cache()

    from navier_stokes_equations_tpu.mesh import generators, taylor_hood
    from navier_stokes_equations_tpu.models import solver, test_cases

    mesh_path = "/root/reference/meshes/mesh-2D-100.msh"
    if os.path.exists(mesh_path):
        mesh = taylor_hood.load(mesh_path)
        mesh_name = "mesh-2D-100"
    else:
        mesh = taylor_hood.build(generators.channel_cylinder_2d(0.03, 0.002))
        mesh_name = "generated-2D-100-equivalent"

    cfg = dataclasses.replace(
        test_cases.make("2D-2", deltat=0.01),
        dtype="float32",
        operator_path=os.environ.get("BENCH_OPERATOR_PATH", "tile"),
        # Round-4 probes (scripts/exp_headline_r4*.py, docs/DESIGN.md
        # round-4 section): the RCB tile clustering (tile_cluster="auto"
        # default) cuts the padded slot width un 104 -> 80 (te=16) and
        # makes te=32 the winner again (un=144, fewest total slots) —
        # 13.0-13.8 -> 17.8-19.1 steps/s across the probe windows.
        tile_elements=int(os.environ.get("BENCH_TILE_E", "32")),
        tile_resident=os.environ.get("BENCH_TILE_RESIDENT", "0") == "1",
        # Round-3 probe (scripts/exp_precond_dev.py, exp_headline_combo.py):
        # at developed-flow ~6 its/step the P1-coarse correction converges at
        # ONE inner PCG sweep — p1_iters=1 keeps the iteration count and cuts
        # the per-application cost (+15%); alloc=16 trims the CGS2 projection
        # traffic at no iteration cost (solves restart there if ever needed).
        precond_p1_iters=int(os.environ.get("BENCH_P1_ITERS", "1")),
        gmres_alloc=int(os.environ.get("BENCH_ALLOC", "16")),
        # Round-5 A/B (same session, median-of-3 windows): f32 18.56,
        # f16 19.76 (+6.4%, Cd/dP within 0.1%, ~1 extra Krylov it),
        # bf16x2 17.83 (f32 bytes + two passes — dead end).  The dense
        # K_p^{-1} apply is byte-bound at 58% of HBM peak; f16 halves its
        # bytes and the 11-bit mantissa (unlike bf16's 8) keeps FGMRES
        # convergence (docs/DESIGN.md round-5).
        kp_inv_storage=os.environ.get("BENCH_KP_STORAGE", "f16"),
    )
    s = solver.NavierStokesSolver(cfg, mesh)

    warmup_steps = int(os.environ.get("BENCH_WARMUP_STEPS", "500"))
    timed_steps = int(os.environ.get("BENCH_TIMED_STEPS", "150"))

    # Warm up into DEVELOPED vortex shedding (t=5: past the ramp AND the
    # shedding onset at t~3-4 — the regime where the solver works hardest
    # and where the reference's 0.31 steps/s average actually lives; timing
    # the quiescent start would flatter us by ~20%).
    window = int(os.environ.get("BENCH_WINDOW", "48"))
    state = s.initial_state()
    state, m = s.run_async(warmup_steps, state, window=window)
    jax.block_until_ready(state.x_old)

    # Timed section: `reps` independent windows, median steps/s (the
    # run-to-run band of a single ~11 s window measured +-10% across
    # round 3 — too noisy to judge against a 50x threshold).  Windowed
    # dispatch: `window` attempts in flight, ONE stacked flag pull per
    # window (identical accepted-state sequence; rewind on the rare
    # non-converged attempt).  Measured +14% over per-step pulls.
    reps = int(os.environ.get("BENCH_REPS", "3"))
    rates = []
    metrics = None
    for _ in range(reps):
        t0 = time.perf_counter()
        state, metrics = s.run_async(timed_steps, state, window=window)
        jax.block_until_ready(metrics.drag)
        rates.append(timed_steps / (time.perf_counter() - t0))
    rates.sort()
    steps_per_sec = rates[len(rates) // 2]
    elapsed = sum(timed_steps / r for r in rates)  # total timed wall
    result = {
        "metric": f"2D-2 steps/sec ({mesh_name}, dt=0.01, developed flow, {jax.devices()[0].platform})",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
    }
    # Absolute hardware-utilization context (VERDICT round-3 item 5):
    # docs/roofline.json is written by scripts/roofline.py on this same
    # headline config — fold the hot-kernel HBM utilization in so the
    # one JSON line carries an absolute number, not only a CPU-relative
    # one.  Stale/absent file just drops the field.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "docs", "roofline.json")) as f:
            rj = json.load(f)
        result["hbm_roofline_pct"] = {
            "tile_apply": rj["kernels"]["tile apply (Krylov op)"]["pct_of_hbm_peak"],
            "schur_dense_kp": rj["kernels"]["dense K_p^-1 matvec"]["pct_of_hbm_peak"],
            "measured_by": "scripts/roofline.py",
        }
    except (OSError, KeyError, ValueError):
        pass
    # Physics sanity recorded to stderr (not part of the JSON contract).
    print(
        f"# physics: Cd_last={float(metrics.drag):.3f} Cl_last={float(metrics.lift):.3f} "
        f"dP_last={float(metrics.delta_p):.3f} t_end={float(state.time):.2f} "
        f"gmres_last={int(metrics.gmres_iters)} wall={elapsed:.2f}s "
        f"windows={[round(r, 2) for r in rates]}",
        file=sys.stderr,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if "--inner" in sys.argv[1:]:
        sys.exit(main())
    sys.exit(_orchestrate())
