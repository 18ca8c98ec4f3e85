"""gmsh MSH v2.2 ASCII reader/writer.

TPU-native replacement for the reference's mesh ingest path
(reference: src/classes/NavierStokes.cpp:7-62), including the
``$ParametricNodes`` -> ``$Nodes`` tolerance (NavierStokes.cpp:16-51): some
gmsh exports emit parametric node sections; we accept them transparently by
reading only the first three coordinates of each node line.

The reader returns plain NumPy arrays; all further preprocessing happens in
``mesh/taylor_hood.py``.  A C++ fast path for very large meshes lives in
``csrc/`` and is used automatically when its shared library is built.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# gmsh element type -> (number of nodes, topological dimension)
_GMSH_TYPES = {
    1: (2, 1),  # 2-node line
    2: (3, 2),  # 3-node triangle
    4: (4, 3),  # 4-node tetrahedron
    15: (1, 0),  # point
}


@dataclasses.dataclass
class RawGmsh:
    """Raw contents of a v2.2 mesh file (1-based node ids already remapped)."""

    points: np.ndarray  # (n_nodes, 3) float64
    physical_names: dict[int, str]  # physical tag -> name
    # per topological dimension: (connectivity int32 (n, nodes), physical tags (n,))
    cells: dict[int, tuple[np.ndarray, np.ndarray]]

    def cells_of_dim(self, dim: int) -> tuple[np.ndarray, np.ndarray]:
        if dim not in self.cells:
            return np.zeros((0, dim + 1), np.int32), np.zeros((0,), np.int32)
        return self.cells[dim]


def _read_physical_names(path: str) -> dict[int, str]:
    """Scan only the (tiny) $PhysicalNames section."""
    names: dict[int, str] = {}
    with open(path, "r") as f:
        in_sec = False
        for line in f:
            s = line.strip()
            if s == "$PhysicalNames":
                in_sec = True
                continue
            if s == "$EndPhysicalNames":
                break
            if s in ("$Nodes", "$ParametricNodes", "$Elements"):
                break
            if in_sec:
                parts = s.split(maxsplit=2)
                if len(parts) == 3:
                    names[int(parts[1])] = parts[2].strip().strip('"')
    return names


def read_msh(path: str) -> RawGmsh:
    # Native fast path (csrc/libnsmesh.so) when built; bulk node/element
    # parsing in C++, tiny PhysicalNames section in Python.
    from . import native

    if native.available():
        raw = native.read_msh_native(path)
        if raw is not None:
            node_ids = raw["node_ids"]
            id_to_idx = np.full(int(node_ids.max()) + 1, -1, np.int64)
            id_to_idx[node_ids] = np.arange(len(node_ids))
            cells: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            for edim, conn_k, tag_k in ((1, "lines", "line_tags"), (2, "tris", "tri_tags"), (3, "tets", "tet_tags")):
                conn = raw[conn_k]
                if len(conn):
                    cells[edim] = (id_to_idx[conn].astype(np.int32), raw[tag_k])
            return RawGmsh(
                points=raw["points"],
                physical_names=_read_physical_names(path),
                cells=cells,
            )

    with open(path, "r") as f:
        lines = f.read().split("\n")

    i = 0
    n = len(lines)
    points = None
    node_ids = None
    physical_names: dict[int, str] = {}
    conn: dict[int, list[list[int]]] = {}
    tags: dict[int, list[int]] = {}

    while i < n:
        line = lines[i].strip()
        i += 1
        if line == "$MeshFormat":
            version = lines[i].split()[0]
            if not version.startswith("2."):
                raise ValueError(f"only MSH v2.x supported, got {version}")
            while lines[i].strip() != "$EndMeshFormat":
                i += 1
            i += 1
        elif line == "$PhysicalNames":
            count = int(lines[i].strip())
            i += 1
            for _ in range(count):
                parts = lines[i].split(maxsplit=2)
                physical_names[int(parts[1])] = parts[2].strip().strip('"')
                i += 1
            i += 1  # $EndPhysicalNames
        elif line in ("$Nodes", "$ParametricNodes"):
            end_tag = "$End" + line[1:]
            count = int(lines[i].strip())
            i += 1
            ids = np.empty(count, np.int64)
            pts = np.empty((count, 3), np.float64)
            for k in range(count):
                parts = lines[i].split()
                ids[k] = int(parts[0])
                # ParametricNodes append entity/parametric columns; the first
                # three floats are always x y z.
                pts[k, 0] = float(parts[1])
                pts[k, 1] = float(parts[2])
                pts[k, 2] = float(parts[3])
                i += 1
            if lines[i].strip() != end_tag:
                raise ValueError(f"malformed node section, expected {end_tag}")
            i += 1
            points = pts
            node_ids = ids
        elif line == "$Elements":
            count = int(lines[i].strip())
            i += 1
            for _ in range(count):
                parts = lines[i].split()
                i += 1
                etype = int(parts[1])
                if etype not in _GMSH_TYPES:
                    continue
                n_nodes, edim = _GMSH_TYPES[etype]
                ntags = int(parts[2])
                phys = int(parts[3]) if ntags >= 1 else 0
                nodes = [int(p) for p in parts[3 + ntags : 3 + ntags + n_nodes]]
                conn.setdefault(edim, []).append(nodes)
                tags.setdefault(edim, []).append(phys)
            if lines[i].strip() != "$EndElements":
                raise ValueError("malformed element section")
            i += 1
        elif line.startswith("$"):
            # Skip unknown sections.
            end_tag = "$End" + line[1:]
            while i < n and lines[i].strip() != end_tag:
                i += 1
            i += 1

    if points is None:
        raise ValueError("mesh file has no $Nodes section")

    # Remap arbitrary 1-based node ids to dense 0-based indices.
    id_to_idx = np.full(int(node_ids.max()) + 1, -1, np.int64)
    id_to_idx[node_ids] = np.arange(len(node_ids))
    cells: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for edim, lst in conn.items():
        c = id_to_idx[np.asarray(lst, np.int64)].astype(np.int32)
        if (c < 0).any():
            raise ValueError("element references unknown node id")
        cells[edim] = (c, np.asarray(tags[edim], np.int32))

    return RawGmsh(points=points, physical_names=physical_names, cells=cells)


def write_msh(
    path: str,
    points: np.ndarray,
    cells: dict[int, tuple[np.ndarray, np.ndarray]],
    physical_names: dict[int, str] | None = None,
) -> None:
    """Write a v2.2 ASCII mesh (used by the native mesh generators)."""
    pts = np.asarray(points, np.float64)
    if pts.shape[1] == 2:
        pts = np.concatenate([pts, np.zeros((len(pts), 1))], axis=1)
    dim_to_type = {1: 1, 2: 2, 3: 4}
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        if physical_names:
            f.write("$PhysicalNames\n%d\n" % len(physical_names))
            for tag in sorted(physical_names):
                # Heuristic dimension: boundary groups are dim-1 of the max.
                name = physical_names[tag]
                pdim = 2 if tag >= 200 else 1
                if 3 in cells:
                    pdim = 3 if tag >= 200 else 2
                f.write('%d %d "%s"\n' % (pdim, tag, name))
            f.write("$EndPhysicalNames\n")
        f.write("$Nodes\n%d\n" % len(pts))
        for k, p in enumerate(pts):
            f.write("%d %.16g %.16g %.16g\n" % (k + 1, p[0], p[1], p[2]))
        f.write("$EndNodes\n")
        total = sum(len(c) for c, _ in cells.values())
        f.write("$Elements\n%d\n" % total)
        eid = 1
        for edim in sorted(cells):
            c, t = cells[edim]
            et = dim_to_type[edim]
            for row, tag in zip(np.asarray(c) + 1, t):
                nodes = " ".join(str(x) for x in row)
                f.write("%d %d 2 %d %d %s\n" % (eid, et, tag, tag, nodes))
                eid += 1
        f.write("$EndElements\n")
