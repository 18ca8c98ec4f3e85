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


def main(argv):
    t0 = None
    if "--from" in argv:
        i = argv.index("--from")
        t0 = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    for p in argv:
        r = stats(p, t0)
        print(p)
        for k, v in r.items():
            print(f"  {k:12s} {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
