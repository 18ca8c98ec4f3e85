"""Benchmark statistics from a forces.txt trace.

    python scripts/trace_stats.py validation/forces_*.txt [--from T0]

Prints Cd_max, Cd_mean, Cl amplitude, Strouhal number (St = f D / U_mean,
D=0.1, U_mean=1.0 for the 2D-2 benchmark — frequency from mean Cl
zero-crossing spacing over the analysis window), and the final dP.
DFG 2D-2 corridors (Schaefer-Turek): St 0.295-0.305, Cd_max 3.22-3.24,
dP(t_end) 2.46-2.50.  3D traces report the Cd plateau (mean over the
final 20% of the window) instead of St.
"""
import sys

import numpy as np


def stats(path, t0=None):
    data = np.loadtxt(path, skiprows=1)
    t, cd, cl, dp = data[:, 0], data[:, 1], data[:, 2], data[:, 3]
    if t0 is None:
        t0 = t[0] + 0.5 * (t[-1] - t[0])  # default: second half
    w = t >= t0
    tw, cdw, clw = t[w], cd[w], cl[w]
    out = {
        "t_range": (float(t[0]), float(t[-1])),
        "window": (float(t0), float(t[-1])),
        "Cd_max": float(cdw.max()),
        "Cd_mean": float(cdw.mean()),
        "Cd_plateau": float(cd[t >= t[0] + 0.8 * (t[-1] - t[0])].mean()),
        "Cl_amp": float(0.5 * (clw.max() - clw.min())),
        "dP_final": float(dp[-1]),
    }
    # Strouhal from mean zero-crossing spacing of (Cl - mean) in the window.
    c = clw - clw.mean()
    s = np.sign(c)
    idx = np.nonzero(s[1:] * s[:-1] < 0)[0]
    if len(idx) >= 4:
        # linear-interpolated crossing times
        tc = tw[idx] - c[idx] * (tw[idx + 1] - tw[idx]) / (c[idx + 1] - c[idx])
        period = 2.0 * np.diff(tc).mean()
        out["St"] = float(0.1 / (period * 1.0))  # D=0.1, U_mean=1.0
        out["n_crossings"] = int(len(idx))
    return out


def dfg_period_stats(path, t_dev=None):
    """Corridor quantities by the Schaefer-Turek 2D-2 definition.

    The benchmark defines cd_max, cl_max and St over ONE PERIOD
    [t0, t0 + 1/f] of the fully developed flow with t0 a time of maximal
    lift, and the pressure difference at the half-period point
    dP(t0 + 1/(2f)).  Corridors: cd_max [3.22, 3.24], cl_max
    [0.99, 1.01], St [0.295, 0.305], dP [2.46, 2.50].

    ``t_dev`` restricts the search to t >= t_dev (default: last 25% of
    the trace) so the growing transient is excluded.
    """
    data = np.loadtxt(path, skiprows=1)
    t, cd, cl, dp = data[:, 0], data[:, 1], data[:, 2], data[:, 3]
    if t_dev is None:
        t_dev = t[0] + 0.75 * (t[-1] - t[0])
    w = t >= t_dev
    tw, clw = t[w], cl[w]
    # Period from the mean zero-crossing spacing in the developed window.
    c = clw - clw.mean()
    s = np.sign(c)
    idx = np.nonzero(s[1:] * s[:-1] < 0)[0]
    if len(idx) < 4:
        raise SystemExit(f"{path}: <2 periods after t={t_dev:.3f} — "
                         "not developed; extend the trace or lower --dev")
    tc = tw[idx] - c[idx] * (tw[idx + 1] - tw[idx]) / (c[idx + 1] - c[idx])
    period = 2.0 * np.diff(tc).mean()
    # Latest lift maximum t0 with a full period of trailing data.
    pk = np.nonzero((clw[1:-1] > clw[:-2]) & (clw[1:-1] >= clw[2:]))[0] + 1
    pk = pk[tw[pk] + period <= tw[-1] + 1e-9]
    if len(pk) == 0:
        raise SystemExit(f"{path}: no lift maximum with a full trailing "
                         "period — extend the trace")
    t0 = tw[pk[-1]]
    win = (t >= t0 - 1e-12) & (t <= t0 + period + 1e-12)
    out = {
        "t0": float(t0),
        "period": float(period),
        "St": float(0.1 / period),
        "Cd_max": float(cd[win].max()),
        "Cl_max": float(cl[win].max()),
        "dP(t0+1/2f)": float(np.interp(t0 + 0.5 * period, t, dp)),
    }
    return out


CORRIDORS = {"St": (0.295, 0.305), "Cd_max": (3.22, 3.24),
             "Cl_max": (0.99, 1.01), "dP(t0+1/2f)": (2.46, 2.50)}


def main(argv):
    t0 = None
    dfg = "--dfg" in argv
    if dfg:
        argv.remove("--dfg")
    if "--from" in argv:
        i = argv.index("--from")
        t0 = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    for p in argv:
        r = dfg_period_stats(p, t0) if dfg else stats(p, t0)
        print(p)
        for k, v in r.items():
            mark = ""
            if dfg and k in CORRIDORS:
                lo, hi = CORRIDORS[k]
                mark = ("  [in corridor]" if lo <= v <= hi
                        else f"  [corridor {lo}-{hi}]")
            print(f"  {k:12s} {v}{mark}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
