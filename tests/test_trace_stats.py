"""Schaefer-Turek one-period corridor statistics (scripts/trace_stats.py).

The 2D-2 corridor quantities are defined over ONE PERIOD of the fully
developed flow starting at a lift maximum, with dP at the half-period
point — a synthetic trace with a known frequency/phase pins the
implementation exactly.
"""

import importlib.util
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "trace_stats", os.path.join(REPO, "scripts", "trace_stats.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_trace(path, t, cd, cl, dp):
    with open(path, "w") as f:
        f.write("Time\tCd\tCl\tDeltaP\n")
        for row in zip(t, cd, cl, dp):
            f.write("\t".join(f"{v:.10g}" for v in row) + "\n")


def test_dfg_period_stats_synthetic(tmp_path):
    ts = _load()
    # f = 3 Hz -> St = 0.1 * 3 = 0.3; growing transient then steady
    # oscillation; dP carries a same-frequency ripple so the half-period
    # sample is phase-sensitive.
    f = 3.0
    t = np.arange(1, 4001) * 0.0025  # t in (0, 10]
    grow = np.minimum(t / 5.0, 1.0)
    cl = grow * np.sin(2 * np.pi * f * t)
    cd = 3.2 + 0.03 * grow * np.cos(2 * np.pi * 2 * f * t)
    dp = 2.48 + 0.02 * grow * np.sin(2 * np.pi * f * t)
    p = tmp_path / "forces.txt"
    _write_trace(p, t, cd, cl, dp)

    r = ts.dfg_period_stats(str(p))
    assert abs(r["period"] - 1.0 / f) < 2e-3
    assert abs(r["St"] - 0.3) < 2e-3
    # t0 is a lift maximum: sin = 1 there; at t0 + 1/2f the dP ripple is
    # at its minimum -> 2.48 - 0.02.
    assert abs(r["Cl_max"] - 1.0) < 1e-3
    assert abs(r["Cd_max"] - 3.23) < 1e-3
    assert abs(r["dP(t0+1/2f)"] - 2.46) < 2e-3
    # Full trailing period available from the chosen t0.
    assert r["t0"] + r["period"] <= t[-1] + 1e-9


def test_dfg_period_stats_rejects_undeveloped(tmp_path):
    ts = _load()
    t = np.arange(1, 801) * 0.0025
    flat = np.full_like(t, 3.0)
    p = tmp_path / "forces.txt"
    _write_trace(p, t, flat, 0 * t, flat)
    try:
        ts.dfg_period_stats(str(p))
    except SystemExit as e:
        assert "not developed" in str(e)
    else:
        raise AssertionError("expected SystemExit on a crossing-free trace")
