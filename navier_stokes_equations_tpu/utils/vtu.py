"""VTU (VTK XML unstructured grid) output for ParaView.

Replaces the reference's DataOut/write_vtu_with_pvtu_record path (reference:
NavierStokes.cpp:1013-1042).  Fields written per step: velocity (vector),
pressure (scalar), and a ``subdomain`` cell field carrying the element ->
device shard id (the analog of the reference's MPI rank field).

Output is written from host copies; the solver loop can emit a file every
``output_every`` steps without touching the compiled graph.  Appended raw
binary encoding keeps files compact and fast to write.
"""

from __future__ import annotations

import base64
import struct

import numpy as np

from ..mesh.taylor_hood import THMesh

_VTK_QUADRATIC_TRIANGLE = 22
_VTK_QUADRATIC_TETRA = 24

# Local P2 node order (vertices, then edge midpoints in ops/elements.py
# TRI_EDGES/TET_EDGES order) -> VTK quadratic cell node order.
_VTK_P2_PERM = {
    2: [0, 1, 2, 3, 4, 5],  # TRI_EDGES (01,12,20) == VTK order
    3: [0, 1, 2, 3, 4, 7, 5, 6, 8, 9],  # VTK wants m01,m12,m02,m03,m13,m23
}


def _b64_block(arr: np.ndarray) -> str:
    raw = arr.tobytes()
    header = struct.pack("<I", len(raw))
    return base64.b64encode(header + raw).decode("ascii")


def write_vtu(
    path: str,
    mesh: THMesh,
    u: np.ndarray,  # (n_vnodes, dim) — full P2 field (vertices + midpoints)
    p: np.ndarray,  # (n_p,)
    subdomain: np.ndarray | None = None,  # (n_el_real,) shard ids
) -> None:
    """Quadratic (P2) cells, so ParaView renders the true Taylor-Hood field
    (the reference writes deal.II patches of the same degree,
    NavierStokes.cpp:1013-1042).  Pressure (P1) is prolongated to edge
    midpoints by averaging its endpoint values — exact for a linear field."""
    dim = mesh.dim
    n_pts = mesh.n_vnodes
    cells = np.asarray(mesh.elems_p2[: mesh.n_el_real], np.int64)
    cells = cells[:, _VTK_P2_PERM[dim]]
    n_cells = len(cells)

    pts = np.zeros((n_pts, 3), np.float32)
    pts[:, :dim] = mesh.vel_coords
    vel = np.zeros((n_pts, 3), np.float32)
    vel[:, :dim] = np.asarray(u)
    p_vert = np.asarray(p, np.float64)
    # P1 -> P2 prolongation: midpoint value = mean of edge endpoint values.
    press = np.zeros(n_pts, np.float32)
    press[: mesh.n_vertices] = p_vert
    ep2 = np.asarray(mesh.elems_p2[: mesh.n_el_real])
    ep1 = np.asarray(mesh.elems_p1[: mesh.n_el_real])
    from ..ops import elements as el

    edge_defs = el.TRI_EDGES if dim == 2 else el.TET_EDGES
    for k, (a, b) in enumerate(edge_defs):
        nodes = ep2[:, dim + 1 + k]
        press[nodes] = 0.5 * (p_vert[ep1[:, a]] + p_vert[ep1[:, b]])

    connectivity = cells.ravel()
    nper = cells.shape[1]
    offsets = (np.arange(1, n_cells + 1, dtype=np.int64)) * nper
    types = np.full(
        n_cells,
        _VTK_QUADRATIC_TRIANGLE if dim == 2 else _VTK_QUADRATIC_TETRA,
        np.uint8,
    )
    sub = (
        np.asarray(subdomain, np.float32)
        if subdomain is not None
        else np.zeros(n_cells, np.float32)
    )

    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">\n')
        f.write("<UnstructuredGrid>\n")
        f.write(f'<Piece NumberOfPoints="{n_pts}" NumberOfCells="{n_cells}">\n')
        f.write("<Points>\n")
        f.write('<DataArray type="Float32" NumberOfComponents="3" format="binary">\n')
        f.write(_b64_block(pts) + "\n</DataArray>\n</Points>\n")
        f.write("<Cells>\n")
        f.write('<DataArray type="Int64" Name="connectivity" format="binary">\n')
        f.write(_b64_block(connectivity) + "\n</DataArray>\n")
        f.write('<DataArray type="Int64" Name="offsets" format="binary">\n')
        f.write(_b64_block(offsets) + "\n</DataArray>\n")
        f.write('<DataArray type="UInt8" Name="types" format="binary">\n')
        f.write(_b64_block(types) + "\n</DataArray>\n</Cells>\n")
        f.write('<PointData Vectors="velocity" Scalars="pressure">\n')
        f.write('<DataArray type="Float32" Name="velocity" NumberOfComponents="3" format="binary">\n')
        f.write(_b64_block(vel) + "\n</DataArray>\n")
        f.write('<DataArray type="Float32" Name="pressure" format="binary">\n')
        f.write(_b64_block(press) + "\n</DataArray>\n</PointData>\n")
        f.write('<CellData Scalars="subdomain">\n')
        f.write('<DataArray type="Float32" Name="subdomain" format="binary">\n')
        f.write(_b64_block(sub) + "\n</DataArray>\n</CellData>\n")
        f.write("</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")


def write_pvd(path: str, entries: list[tuple[float, str]]) -> None:
    """ParaView collection file: (time, vtu filename) series."""
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="Collection" version="0.1" byte_order="LittleEndian">\n')
        f.write("<Collection>\n")
        for t, name in entries:
            f.write(f'<DataSet timestep="{t}" group="" part="0" file="{name}"/>\n')
        f.write("</Collection>\n</VTKFile>\n")
