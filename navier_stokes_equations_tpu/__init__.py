"""navier_stokes_equations_tpu — TPU-native incompressible Navier-Stokes engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
deal.II/Trilinos/MPI solver (gdonninelli/Navier-Stokes_equations): parallel
finite-element simulation of unsteady incompressible flow past a cylinder
(Schaefer-Turek DFG benchmarks, 2D and 3D), with Taylor-Hood P2/P1 simplex
elements, theta-method time stepping, Newton or semi-implicit (Oseen)
linearization, FGMRES with a Cahouet-Chabard block preconditioner, SUPG +
grad-div stabilization, and drag/lift/pressure-drop functionals.

Architecture (TPU-first, not a port):
  * static padded structure-of-arrays mesh, built once on the host;
  * matrix-free batched element kernels (MXU-shaped einsums) instead of
    distributed sparse matrices;
  * polynomial / inner-Krylov preconditioning instead of ILU/AMG;
  * the full time step is one jitted function; the time loop streams steps;
  * multi-chip scaling via jax.sharding over element blocks with XLA
    collectives over ICI instead of MPI ghost exchange.
"""

from . import config
from .config import NonlinearMethod, SolverConfig, TimeScheme

__version__ = "0.1.0"

__all__ = [
    "config",
    "SolverConfig",
    "TimeScheme",
    "NonlinearMethod",
    "__version__",
]
