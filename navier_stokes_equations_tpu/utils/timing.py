"""Per-phase timing and device profiling.

The reference only records per-step wall clock with std::chrono (reference:
NavierStokes.cpp:1113, 1291-1296).  Here:

  * ``PhaseTimer`` — named host-side accumulators (setup / compile / step /
    io), reported as a table;
  * ``trace()`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable device trace (XLA ops, fusion, HBM traffic);
  * ``steps_per_second`` — the canonical throughput measurement used by
    bench.py (sync-once timing of a scan-driven loop).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Iterator

import jax


class PhaseTimer:
    def __init__(self):
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase                    total [s]    calls    mean [ms]"]
        for name in sorted(self.totals, key=lambda k: -self.totals[k]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<24s} {t:>9.3f} {c:>8d} {1e3 * t / c:>11.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ns_tpu_trace") -> Iterator[None]:
    """Device trace around a code block (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def steps_per_second(solver, n_steps: int, state=None, warmup: int = 2) -> float:
    """Throughput of the jitted step loop, one device sync at the end."""
    state = state if state is not None else solver.initial_state()
    state, m = solver.run_async(warmup, state)
    jax.block_until_ready(state.x_old)
    t0 = time.perf_counter()
    state, m = solver.run_async(n_steps, state)
    jax.block_until_ready(m.drag)
    return n_steps / (time.perf_counter() - t0)
