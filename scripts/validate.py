"""Regenerate the validation traces in validation/ on real hardware.

Runs the headline benchmark configurations end to end through the CLI
driver and refreshes the stored forces.txt traces + summary statistics.
Budget on one TPU v5e chip: ~5 min (2D-1) + ~4 min (2D-2 T=8) + ~10 min
(3D-2Z) + ~11 min (2D-2 T=25); pass case names to run a subset.

    python scripts/validate.py            # all cases
    python scripts/validate.py 2d1 2d2    # subset
"""

import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# Current-default (P1-coarse-preconditioned) trace names; the bare-name
# files in validation/ are the older Jacobi-preconditioned generation
# (kept for the tolerance-error comparison, see validation/README.md).
RUNS = {
    "2d1": (
        ["--case", "2D-1", "--mesh", "/root/reference/meshes/mesh-2D-100.msh",
         "--steps", "50"],
        "forces_2d1_mesh-2D-100_tpu_f32_p1coarse.txt",
    ),
    "2d2": (
        ["--case", "2D-2", "--mesh", "/root/reference/meshes/mesh-2D-100.msh",
         "--deltat", "0.01"],
        "forces_2d2_mesh-2D-100_tpu_f32_p1coarse.txt",
    ),
    "2d3": (
        ["--case", "2D-3", "--mesh", "/root/reference/meshes/mesh-2D-100.msh"],
        "forces_2d3_mesh-2D-100_tpu_f32_p1coarse.txt",
    ),
    "2d2_t25": (
        ["--case", "2D-2", "--mesh", "/root/reference/meshes/mesh-2D-100.msh",
         "--deltat", "0.01", "--T", "25"],
        "forces_2d2_T25_mesh-2D-100_tpu_f32_p1coarse.txt",
    ),
    "3d1z": (
        ["--case", "3D-1Z", "--mesh", os.path.join(REPO, "meshes/mesh-3D-medium.msh"),
         "--steps", "50"],
        "forces_3d1z_mesh-3D-medium_tpu_f32_p1coarse.txt",
    ),
    "3d2z": (
        ["--case", "3D-2Z", "--mesh", os.path.join(REPO, "meshes/mesh-3D-medium.msh")],
        "forces_3d2z_mesh-3D-medium_tpu_f32_p1coarse.txt",
    ),
    "3d3z": (
        ["--case", "3D-3Z", "--mesh", os.path.join(REPO, "meshes/mesh-3D-medium.msh")],
        "forces_3d3z_mesh-3D-medium_tpu_f32_p1coarse.txt",
    ),
    # Corridor-closure rung (~45 min on one chip; not in the default set).
    # --criterion rhs is EXPLICIT: gmres_criterion="auto" (the default)
    # selects "defect" above 500k dofs, which is the 3x-iterations
    # companion below — this entry is the validated-cost 'rhs' variant.
    "2d2_855k": (
        ["--case", "2D-2", "--mesh", os.path.join(REPO, "meshes/mesh-2D-gen-xfine.msh"),
         "--deltat", "0.0025", "--operator-path", "tile", "--tile-elements", "16",
         "--criterion", "rhs"],
        "forces_2d2_855k_dt0.0025_tpu_f32_tile.txt",
    ),
    # Tolerance-sensitivity companion: same rung, defect-normalized stopping
    # (~3x the iterations) — separates mesh error from tolerance error in
    # the corridor misses (580k: Dp 1.2% low, Cd_max 1% high).
    "2d2_855k_defect": (
        ["--case", "2D-2", "--mesh", os.path.join(REPO, "meshes/mesh-2D-gen-xfine.msh"),
         "--deltat", "0.0025", "--operator-path", "tile", "--tile-elements", "16",
         "--criterion", "defect"],
        "forces_2d2_855k_dt0.0025_tpu_f32_tile_defect.txt",
    ),
    # Steady-3D dP margin rung: 3D-1Z on the 666k-dof mesh (the medium-mesh
    # trace sits at dP=0.180 vs the [0.165, 0.175] corridor, +3% — a
    # resolution miss; Newton runs the host driver at this size).
    "3d1z_fine": (
        ["--case", "3D-1Z", "--mesh", os.path.join(REPO, "meshes/mesh-3D-fine.msh"),
         "--steps", "50"],
        "forces_3d1z_mesh-3D-fine_tpu_f32.txt",
    ),
    # The 1.36M-dof rung with the defect criterion — the preset 'rhs'
    # tolerance freezes and produces non-physics at this scale
    # (docs/DESIGN.md "accuracy cliff").  rtol 1e-2 is the REFERENCE's own
    # linearized SolverControl level (NavierStokes.cpp:836); the 1e-5*||b||
    # floor bounds per-step backward error 10x under the measured cliff.
    # The repo's default rtol=1e-4 against the 1e-6 floor costs ~170
    # its/step (~70 s/step) at this scale for no measurable physics gain
    # (docs/DESIGN.md round-3 measurements); ~3h on one chip as configured.
    "3d2z_xfine": (
        ["--case", "3D-2Z", "--mesh", os.path.join(REPO, "meshes/mesh-3D-xfine.msh"),
         "--criterion", "defect", "--rtol", "1e-2", "--defect-floor", "1e-5"],
        "forces_3d2z_mesh-3D-xfine_tpu_f32_defect.txt",
    ),
}
DEFAULT_SKIP = {"2d2_855k", "2d2_855k_defect", "3d2z_xfine", "3d1z_fine"}


def main(argv):
    names = argv or [n for n in RUNS if n not in DEFAULT_SKIP]
    for name in names:
        args, out_name = RUNS[name]
        outdir = f"/tmp/validate_{name}"
        shutil.rmtree(outdir, ignore_errors=True)
        print(f"=== {name}: main.py {' '.join(args)}", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"), *args,
             "--output-dir", outdir, "--quiet"],
            check=True,
            cwd=REPO,
        )
        dst = os.path.join(REPO, "validation", out_name)
        shutil.copy(os.path.join(outdir, "forces.txt"), dst)
        print(f"    -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
