"""Generate the benchmark meshes natively and write them as gmsh v2.2 files.

Counterpart of the reference's gmsh .geo pipeline (reference: meshes/*.geo,
README.md:41-55) — the 3D .msh files are not committed upstream
(.gitignore:44), so this produces them from scratch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from navier_stokes_equations_tpu.mesh import generators, gmsh_io, taylor_hood

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "meshes")


def _boundary_cells(mesh):
    """Extract tagged boundary faces back from a built THMesh."""
    faces = []
    tags = []
    for bid, bf in mesh.boundary.items():
        for row in bf.vertex_nodes:
            faces.append(list(row))
            tags.append(bid)
    return np.asarray(faces, np.int32), np.asarray(tags, np.int32)


def write(name, raw):
    mesh = taylor_hood.build(raw)
    dim = mesh.dim
    bfaces, btags = _boundary_cells(mesh)
    cells = {dim - 1: (bfaces, btags), dim: raw.cells_of_dim(dim)}
    # Re-point volume cells at the compacted vertex set used by the builder.
    vol, vtags = raw.cells_of_dim(dim)
    cells[dim] = (mesh.elems_p1, vtags[: mesh.n_el_real])
    path = os.path.join(OUT, name)
    pts = mesh.vertices
    gmsh_io.write_msh(path, pts, cells, raw.physical_names)
    print(f"{name}: {mesh.n_vertices} nodes, {mesh.n_el_real} cells -> {path}")


def main():
    os.makedirs(OUT, exist_ok=True)
    # 2D refinement ladder (analog of mesh-2D / -40 / -100 / -200).
    write("mesh-2D-gen.msh", generators.channel_cylinder_2d(h_far=0.05, h_cyl=0.005))
    write("mesh-2D-gen-fine.msh", generators.channel_cylinder_2d(h_far=0.03, h_cyl=0.0025))
    # Corridor-closure rung (~855k dofs): the 580k rung leaves Dp 1.2% low
    # and Cd_max 1% high vs the DFG corridor (validation/README.md).
    write("mesh-2D-gen-xfine.msh", generators.channel_cylinder_2d(h_far=0.026, h_cyl=0.0012))
    # Wake-corrected corridor rung (~696k dofs): the xfine grading spends
    # its dofs at the cylinder (h_cyl=0.0012) while the far field stays
    # at h=0.026 — the T=14 855k trace shows a CLEAN developed cycle at
    # St 0.273 / Cl_max 1.12, off the corridor, while the uniformly-fine
    # mesh-2D-100 (h~0.010-0.013 everywhere) holds St 0.298 to t=24.
    # This rung flips the budget: far field 2.2x finer, cylinder h
    # 0.0015 (still 4x finer than mesh-2D-100's near field).
    write("mesh-2D-gen-xfine2.msh", generators.channel_cylinder_2d(h_far=0.012, h_cyl=0.0015))
    # 3D ladder (analog of mesh-3D-5 / -10).
    write("mesh-3D-coarse.msh", generators.channel_cylinder_3d(h_far=0.1, h_cyl=0.03, n_layers=5))
    write("mesh-3D-medium.msh", generators.channel_cylinder_3d(h_far=0.06, h_cyl=0.02, n_layers=8))
    write("mesh-3D-fine.msh", generators.channel_cylinder_3d(h_far=0.045, h_cyl=0.012, n_layers=11))
    # The rung the reference DEFINED but never ran (meshes/mesh-3D-40.geo):
    # 309k tets / 1.36M dofs — resolved-drag territory (Cd -> ~3.3).
    write("mesh-3D-xfine.msh", generators.channel_cylinder_3d(h_far=0.035, h_cyl=0.009, n_layers=14))
    # Spanwise-anisotropy discriminator for the 3D-1Z dP miss (round 5):
    # SAME in-plane resolution as mesh-3D-medium, spanwise layers doubled
    # (8 -> 16; extrusion spacing 0.051 -> 0.0256, cylinder anisotropy
    # 2.6:1 -> 1.3:1).  The dP ladder WORSENED under in-plane-dominant
    # refinement (221k: +3% -> 666k: +5.5% vs [0.165, 0.175]); if dP moves
    # toward the corridor here, spanwise under-resolution is the cause.
    write("mesh-3D-medium-z16.msh", generators.channel_cylinder_3d(h_far=0.06, h_cyl=0.02, n_layers=16))


if __name__ == "__main__":
    main()
