"""Console log + forces.txt writer replicating the reference's artifacts.

The reference emits (reference: NavierStokes.cpp:1063-1068, 1083, 1312-1319):
  * a rank-0 console stream: per-step line with time, solver iterations,
    wall time and ``Cd= Cl= dP=``;
  * ``forces.txt``: TSV ``Time\\tCd\\tCl\\tDeltaP``, flushed every step —
    the north-star artifact used for benchmark validation.

In the SPMD design there is one controller process, so "rank 0" is simply
the host; the formats are kept byte-compatible so existing post-processing
notebooks keep working.
"""

from __future__ import annotations

import sys
from typing import IO, Optional


class RunLogger:
    def __init__(
        self,
        forces_path: Optional[str] = "forces.txt",
        stream: Optional[IO] = None,
        verbose: bool = True,
    ):
        self.stream = stream if stream is not None else sys.stdout
        self.verbose = verbose
        self._forces = None
        if forces_path:
            self._forces = open(forces_path, "w")
            self._forces.write("Time\tCd\tCl\tDeltaP\n")
            self._forces.flush()

    def log_setup(self, solver) -> None:
        if not self.verbose:
            return
        cfg = solver.cfg
        mesh = solver.mesh
        w = self.stream.write
        w("===============================================\n")
        w(f"Test case: {cfg.name} — {cfg.description}\n")
        w(f"  dim = {cfg.dim}, Re = {cfg.Re}, U_m = {cfg.U_m}, nu = {solver.nu:.6g}\n")
        w(f"  scheme = {cfg.time_scheme.value}, method = {cfg.nonlinear_method.value}, "
          f"SUPG = {cfg.use_supg}\n")
        w(f"  dt = {solver.dt0}, T = {cfg.T}, dtype = {cfg.dtype}\n")
        w(f"  Number of elements = {mesh.n_el_real}\n")
        w(f"  Number of DoFs     = {solver.fe.n_dofs} "
          f"(velocity {solver.fe.n_udofs} + pressure {solver.fe.n_p})\n")
        w("===============================================\n")
        self.stream.flush()

    def log_step(self, rec: dict) -> None:
        if self.verbose:
            line = ""
            if rec.get("re_instant") is not None:
                # Time-varying-inlet cases print the instantaneous Reynolds
                # number (reference: NavierStokes.cpp:1089-1111).
                line += f"   Instantaneous Re: {rec['re_instant']:g}\n"
            line += f"Time step {rec['step']} at t={rec['time']:g}"
            if rec.get("newton_iters", 0):
                line += f"  Newton: {rec['newton_iters']} iters"
            line += f"  GMRES: {rec['gmres_iters']} iters"
            if not rec.get("converged", True):
                line += "  WARNING: solver did NOT converge"
            line += f"  Wall time: {rec['wall']:.4g} s\n"
            line += f"  Cd={rec['Cd']:g}  Cl={rec['Cl']:g}  dP={rec['DeltaP']:g}\n"
            self.stream.write(line)
            self.stream.flush()
        if self._forces is not None:
            self._forces.write(
                f"{rec['time']:g}\t{rec['Cd']:g}\t{rec['Cl']:g}\t{rec['DeltaP']:g}\n"
            )
            self._forces.flush()

    def close(self) -> None:
        if self._forces is not None:
            self._forces.close()
            self._forces = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
