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

_VTK_TRIANGLE = 5
_VTK_TETRA = 10


def _b64_block(arr: np.ndarray) -> str:
    raw = arr.tobytes()
    header = struct.pack("<I", len(raw))
    return base64.b64encode(header + raw).decode("ascii")


def write_vtu(
    path: str,
    mesh: THMesh,
    u: np.ndarray,  # (n_vnodes, dim) — only vertex values are written (P1 view)
    p: np.ndarray,  # (n_p,)
    subdomain: np.ndarray | None = None,  # (n_el_real,) shard ids
) -> None:
    dim = mesh.dim
    n_pts = mesh.n_vertices
    cells = np.asarray(mesh.elems_p1[: mesh.n_el_real], np.int32)
    n_cells = len(cells)

    pts = np.zeros((n_pts, 3), np.float32)
    pts[:, :dim] = mesh.vertices
    vel = np.zeros((n_pts, 3), np.float32)
    vel[:, :dim] = np.asarray(u)[:n_pts]
    press = np.asarray(p, np.float32)

    connectivity = cells.astype(np.int64).ravel()
    offsets = (np.arange(1, n_cells + 1, dtype=np.int64)) * (dim + 1)
    types = np.full(n_cells, _VTK_TRIANGLE if dim == 2 else _VTK_TETRA, np.uint8)
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
