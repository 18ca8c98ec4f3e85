"""Regenerate the committed CI trend-gate mini-trace (CPU f64, 10 steps).

Run after any INTENTIONAL physics change, commit the refreshed file, and
note the reason in the commit message (tests/test_validation_regression.py
gates against it at 1e-8 relative).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import dataclasses

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from navier_stokes_equations_tpu.mesh import taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen(case, mesh_path, out_name):
    mesh = taylor_hood.load(mesh_path)
    cfg = dataclasses.replace(
        test_cases.make(case), dtype="float64", gmres_rtol=1e-6,
        precond_schur_dense_max=0,
    )
    s = solver.NavierStokesSolver(cfg, mesh)
    st, hist = s.run(n_steps=10)
    out = os.path.join(REPO, "validation", out_name)
    with open(out, "w") as f:
        f.write("Time\tCd\tCl\tDeltaP\n")
        for h in hist:
            f.write(
                f"{h['time']:.17g}\t{h['Cd']:.17g}\t{h['Cl']:.17g}\t{h['DeltaP']:.17g}\n"
            )
    print("wrote", out)


gen("2D-2", "/root/reference/meshes/mesh-2D-100.msh", "ci_2d2_mesh100_f64_10steps.txt")
# 3D/SUPG gate: the 2D gate cannot catch drift in the SUPG strong-residual
# terms, the tet quadrature path, or the 3D functionals (F_z drag).
gen("3D-2Z", os.path.join(REPO, "meshes/mesh-3D-coarse.msh"),
    "ci_3d2z_coarse_f64_10steps.txt")
