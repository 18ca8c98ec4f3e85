"""Static structure-of-arrays Taylor-Hood (P2/P1) simplex mesh.

This is the TPU-native replacement for the reference's deal.II DoF machinery
(reference: src/classes/NavierStokes.cpp:82-273).  Everything here runs once
at setup on the host (NumPy); the resulting fixed-shape arrays become inputs
or constants of the jitted compute graphs:

  * pressure DoFs  = mesh vertices (P1),
  * velocity nodes = vertices + synthesized edge midpoints (P2); the gmsh
    file only carries P1 vertices, exactly as in the reference where deal.II
    generated the P2 DoFs internally,
  * per-element affine geometry (Jacobian inverse, |det J|, longest edge),
  * boundary faces grouped by boundary id with face-quadrature tables
    (used for Dirichlet node sets and the drag/lift surface integrals,
    reference: NavierStokes.cpp:913-1011),
  * probe-point localization for the pressure-difference functional
    (reference: NavierStokes.cpp:871-912).

Block DoF layout mirrors the reference's component-wise renumbering
(NavierStokes.cpp:87-89): the global solution vector is
``[u_0 | u_1 (| u_2) | p]`` with each velocity component over all P2 nodes.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import elements as el
from ..ops import quadrature as quad
from . import gmsh_io

# Reference boundary ids (reference: src/classes/NavierStokes.hpp:518-521).
INLET_ID = 101
OUTLET_ID = 102


def wall_id(dim: int) -> int:
    return 103 if dim == 2 else 104


def cylinder_id(dim: int) -> int:
    return 104 if dim == 2 else 103


_NAME_TO_ROLE = {"inlet": "inlet", "outlet": "outlet", "walls": "wall", "wall": "wall", "cylinder": "cylinder", "obstacle": "cylinder"}


@dataclasses.dataclass
class BoundaryFaces:
    """All boundary faces carrying one boundary id, with quadrature tables."""

    elem: np.ndarray  # (nf,) owning element
    vertex_nodes: np.ndarray  # (nf, dim) global vertex ids of the face
    all_nodes: np.ndarray  # (nf, dim + n_face_edges) global P2 node ids
    normals: np.ndarray  # (nf, dim) outward unit normals (straight faces)
    jxw: np.ndarray  # (nf, nq) face quadrature weights * measure
    # Cell-basis tables at the face quadrature points:
    p2_values: np.ndarray  # (nf, nq, n_en2)
    p2_ref_grads: np.ndarray  # (nf, nq, n_en2, dim)
    p1_values: np.ndarray  # (nf, nq, n_en1)

    @property
    def num_faces(self) -> int:
        return len(self.elem)


@dataclasses.dataclass
class THMesh:
    dim: int
    vertices: np.ndarray  # (n_vert, dim)
    vel_coords: np.ndarray  # (n_vnodes, dim) vertex coords then edge midpoints
    elems_p1: np.ndarray  # (n_el, dim+1) int32 pressure connectivity
    elems_p2: np.ndarray  # (n_el, n_en2) int32 velocity connectivity
    jinv: np.ndarray  # (n_el, dim, dim)  d(ref)/d(phys)
    detj: np.ndarray  # (n_el,) |det J| (0 for padded elements)
    diameters: np.ndarray  # (n_el,) longest edge (SUPG h; TriaAccessor::diameter)
    boundary: dict[int, BoundaryFaces]
    n_el_real: int  # elements before padding

    @property
    def n_vertices(self) -> int:
        return len(self.vertices)

    @property
    def n_vnodes(self) -> int:
        return len(self.vel_coords)

    @property
    def n_el(self) -> int:
        return len(self.elems_p1)

    @property
    def n_en1(self) -> int:
        return self.dim + 1

    @property
    def n_en2(self) -> int:
        return self.elems_p2.shape[1]

    # ---- block DoF layout: [u_0 | u_1 (| u_2) | p] --------------------
    @property
    def n_udofs(self) -> int:
        return self.dim * self.n_vnodes

    @property
    def n_dofs(self) -> int:
        return self.n_udofs + self.n_vertices

    def velocity_nodes_of(self, bid: int) -> np.ndarray:
        """Unique P2 node ids on boundary ``bid``."""
        bf = self.boundary.get(bid)
        if bf is None or bf.num_faces == 0:
            return np.zeros((0,), np.int32)
        return np.unique(bf.all_nodes.ravel())

    def pressure_nodes_of(self, bid: int) -> np.ndarray:
        bf = self.boundary.get(bid)
        if bf is None or bf.num_faces == 0:
            return np.zeros((0,), np.int32)
        return np.unique(bf.vertex_nodes.ravel())


def _unique_edges(cells: np.ndarray, edges: tuple[tuple[int, int], ...]) -> tuple[np.ndarray, np.ndarray]:
    """Deduplicate element edges.

    Returns (unique_edges (n_edges, 2) with sorted endpoints,
             elem_edge_index (n_el, n_edges_per_elem) into the unique list).
    """
    from . import native

    if native.available():
        res = native.unique_edges_native(cells, edges)
        if res is not None:
            return res[0].astype(cells.dtype), res[1]

    n_el = len(cells)
    pairs = np.stack([cells[:, [a, b]] for a, b in edges], axis=1)  # (n_el, ne, 2)
    pairs_sorted = np.sort(pairs.reshape(-1, 2), axis=1)
    uniq, inverse = np.unique(pairs_sorted, axis=0, return_inverse=True)
    return uniq, inverse.reshape(n_el, len(edges)).astype(np.int64)


def _fix_orientation(vertices: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """Ensure positive Jacobian determinant by swapping the last two vertices."""
    cells = cells.copy()
    v = vertices[cells]  # (n_el, nv, dim)
    J = (v[:, 1:, :] - v[:, :1, :]).transpose(0, 2, 1)  # columns = edges
    det = np.linalg.det(J)
    flip = det < 0
    if flip.any():
        c = cells[flip]
        c[:, [-2, -1]] = c[:, [-1, -2]]
        cells[flip] = c
    return cells


def _geometric_boundary_role(dim: int, face_verts: np.ndarray, tol: float = 1e-6) -> np.ndarray:
    """Classify boundary faces by geometry — the reference's repair fallback
    (reference: src/classes/NavierStokes.cpp:107-195).

    2D channel: [0, 2.2] x [0, 0.41], cylinder r=0.05 at (0.2, 0.2).
    3D channel: [0, 0.41]^2 x [0, 2.5] (flow along z), cylinder axis along x
    at (y, z) = (0.2, 0.45)  (reference: meshes/mesh-3D-5.geo:9-15).

    ``face_verts``: (nf, dim, dim) vertex coordinates of each face.  Planar
    boundaries require *every* vertex on the plane, so that wall faces that
    merely pass near the cylinder axis are not misclassified; the cylinder
    test uses the centroid radius (chord centroids lie slightly inside).
    Returns integer roles: 0 inlet, 1 outlet, 2 wall, 3 cylinder.
    """
    v = face_verts
    c = v.mean(axis=1)
    roles = np.full(len(c), -1, np.int32)

    def on_plane(axis, value):
        return np.abs(v[:, :, axis] - value).max(axis=1) < tol

    if dim == 2:
        roles[np.hypot(c[:, 0] - 0.2, c[:, 1] - 0.2) < 0.075] = 3
        roles[(roles < 0) & (on_plane(1, 0.0) | on_plane(1, 0.41))] = 2
        roles[(roles < 0) & on_plane(0, 0.0)] = 0
        roles[(roles < 0) & on_plane(0, 2.2)] = 1
    else:
        wall = on_plane(0, 0.0) | on_plane(0, 0.41) | on_plane(1, 0.0) | on_plane(1, 0.41)
        roles[wall] = 2
        roles[(roles < 0) & on_plane(2, 0.0)] = 0
        roles[(roles < 0) & on_plane(2, 2.5)] = 1
        roles[(roles < 0) & (np.hypot(c[:, 1] - 0.2, c[:, 2] - 0.45) < 0.075)] = 3
    roles[roles < 0] = 2
    return roles


_ROLE_TO_ID = lambda dim: {0: INLET_ID, 1: OUTLET_ID, 2: wall_id(dim), 3: cylinder_id(dim)}


def build(raw: gmsh_io.RawGmsh, n_face_q1d: int = 3, repair_boundary_ids: bool = True) -> THMesh:
    """Build the Taylor-Hood mesh structure from a parsed gmsh file."""
    if 3 in raw.cells and len(raw.cells[3][0]) > 0:
        dim = 3
    elif 2 in raw.cells and len(raw.cells[2][0]) > 0:
        dim = 2
    else:
        raise ValueError("mesh contains no triangles or tetrahedra")

    vertices_full = raw.points[:, :dim].copy()
    cells, _ = raw.cells_of_dim(dim)
    bfaces, btags = raw.cells_of_dim(dim - 1)

    # Drop nodes not referenced by any volume cell (gmsh sometimes keeps
    # construction points); remap everything to the compact vertex set.
    used = np.zeros(len(vertices_full), bool)
    used[cells.ravel()] = True
    if not used.all():
        new_idx = np.cumsum(used) - 1
        vertices = vertices_full[used]
        cells = new_idx[cells].astype(np.int32)
        keep_face = used[bfaces].all(axis=1)
        bfaces = new_idx[bfaces[keep_face]].astype(np.int32)
        btags = btags[keep_face]
    else:
        vertices = vertices_full

    cells = _fix_orientation(vertices, cells.astype(np.int64))

    # Valence-clustered vertex numbering: sort vertices by descending
    # element valence so the transpose assembly maps (ops/fe_arrays.py) can
    # use tight per-bucket pad widths — TPU gather cost is proportional to
    # padded slots, and tet vertex valences span 4..40+.  Purely an internal
    # renumbering; all outputs stay self-consistent.
    valence = np.bincount(cells.ravel(), minlength=len(vertices))
    vperm = np.argsort(-valence, kind="stable")
    vinv = np.empty_like(vperm)
    vinv[vperm] = np.arange(len(vperm))
    vertices = vertices[vperm]
    cells = vinv[cells]
    if len(bfaces):
        bfaces = vinv[bfaces].astype(np.int32)

    # --- P2 velocity nodes: vertices then unique edge midpoints -----------
    edge_list = el.TRI_EDGES if dim == 2 else el.TET_EDGES
    uniq_edges, elem_edge_idx = _unique_edges(cells, edge_list)
    # Same valence clustering for the synthesized edge-midpoint nodes.
    e_val = np.bincount(elem_edge_idx.ravel(), minlength=len(uniq_edges))
    eperm = np.argsort(-e_val, kind="stable")
    einv = np.empty_like(eperm)
    einv[eperm] = np.arange(len(eperm))
    uniq_edges = uniq_edges[eperm]
    elem_edge_idx = einv[elem_edge_idx]
    n_vert = len(vertices)
    midpoints = 0.5 * (vertices[uniq_edges[:, 0]] + vertices[uniq_edges[:, 1]])
    vel_coords = np.vstack([vertices, midpoints])
    elems_p2 = np.concatenate([cells, n_vert + elem_edge_idx], axis=1).astype(np.int32)
    elems_p1 = cells.astype(np.int32)

    # --- affine geometry ---------------------------------------------------
    v = vertices[cells]  # (n_el, nv, dim)
    J = (v[:, 1:, :] - v[:, :1, :]).transpose(0, 2, 1)
    detj = np.linalg.det(J)
    assert (detj > 0).all(), "element orientation fix failed"
    jinv = np.linalg.inv(J)
    # Longest pairwise vertex distance (deal.II TriaAccessor::diameter()).
    diffs = v[:, :, None, :] - v[:, None, :, :]
    diameters = np.sqrt((diffs**2).sum(-1)).max(axis=(1, 2))

    # --- boundary faces ----------------------------------------------------
    mesh_boundary = _build_boundary(
        dim, vertices, cells, elems_p2, jinv, bfaces, btags, raw.physical_names, n_face_q1d, repair_boundary_ids
    )

    return THMesh(
        dim=dim,
        vertices=vertices,
        vel_coords=vel_coords,
        elems_p1=elems_p1,
        elems_p2=elems_p2,
        jinv=jinv,
        detj=np.abs(detj),
        diameters=diameters,
        boundary=mesh_boundary,
        n_el_real=len(elems_p1),
    )


def _build_boundary(dim, vertices, cells, elems_p2, jinv, bfaces, btags, physical_names, n_face_q1d, repair):
    face_defs = el.TRI_FACES if dim == 2 else el.TET_FACES
    n_el = len(cells)

    # Map sorted face vertex tuple -> (element, local vertex positions).
    face_map: dict[tuple, tuple[int, tuple[int, ...]]] = {}
    counts: dict[tuple, int] = {}
    for f in face_defs:
        fverts = cells[:, list(f)]  # (n_el, dim)
        key = np.sort(fverts, axis=1)
        for e in range(n_el):
            k = tuple(key[e])
            counts[k] = counts.get(k, 0) + 1
            face_map[k] = (e, tuple(int(x) for x in fverts[e]))

    # Resolve boundary ids.  Physical names win; numeric reference convention
    # otherwise; geometric repair as last resort (reference behavior).
    known_ids = {INLET_ID, OUTLET_ID, wall_id(dim), cylinder_id(dim)}
    name_by_tag = {t: _NAME_TO_ROLE.get(n.lower()) for t, n in physical_names.items()}
    role_ids = _ROLE_TO_ID(dim)

    if len(bfaces) == 0:
        # No tagged boundary in the file: take all once-seen faces, classify
        # geometrically (full repair path).
        only = [k for k, c in counts.items() if c == 1]
        bfaces = np.array(only, np.int32)
        btags = np.zeros(len(bfaces), np.int32)

    geo_roles = _geometric_boundary_role(dim, vertices[bfaces])

    resolved = np.empty(len(bfaces), np.int32)
    for i, t in enumerate(btags):
        t = int(t)
        role = name_by_tag.get(t)
        if role == "inlet":
            resolved[i] = INLET_ID
        elif role == "outlet":
            resolved[i] = OUTLET_ID
        elif role == "wall":
            resolved[i] = wall_id(dim)
        elif role == "cylinder":
            resolved[i] = cylinder_id(dim)
        elif t in known_ids:
            resolved[i] = t
        elif repair:
            resolved[i] = role_ids[int(geo_roles[i])]
        else:
            resolved[i] = t

    # Face quadrature on the reference (dim-1)-simplex.
    frule = quad.simplex_rule(dim - 1, n_face_q1d)
    nqf = frule.num_points

    edge_list = el.TRI_EDGES if dim == 2 else el.TET_EDGES
    edge_pos = {tuple(sorted(e)): dim + 1 + i for i, e in enumerate(edge_list)}

    out: dict[int, BoundaryFaces] = {}
    for bid in sorted(set(int(x) for x in resolved)):
        sel = np.nonzero(resolved == bid)[0]
        f_elem, f_vnodes, f_allnodes, f_norm, f_jxw = [], [], [], [], []
        f_p2v, f_p2g, f_p1v = [], [], []
        for i in sel:
            key = tuple(sorted(int(x) for x in bfaces[i]))
            if key not in face_map:
                raise ValueError(f"boundary face {key} not attached to any element")
            e, local_glob = face_map[key]
            cell_nodes = [int(x) for x in cells[e]]
            # Local vertex indices of the face within the element, ordered as
            # stored in the element (orientation does not matter for the
            # integrals; the quadrature point *set* is what counts).
            local_idx = tuple(cell_nodes.index(g) for g in local_glob)

            # Quadrature points in cell reference coordinates.
            cell_pts = el.face_points_to_cell(dim, local_idx, frule.points)
            t2 = el.shape_tables(dim, 2, cell_pts)
            t1 = el.shape_tables(dim, 1, cell_pts)

            # Geometry of the straight face.
            gv = vertices[list(local_glob)]
            if dim == 2:
                tang = gv[1] - gv[0]
                length = np.linalg.norm(tang)
                nrm = np.array([tang[1], -tang[0]]) / length
                opposite = vertices[[x for x in cell_nodes if x not in local_glob][0]]
                if np.dot(nrm, gv.mean(axis=0) - opposite) < 0:
                    nrm = -nrm
                jxw = frule.weights * length  # 1D ref weights sum to 1
            else:
                cr = np.cross(gv[1] - gv[0], gv[2] - gv[0])
                nrm = cr / np.linalg.norm(cr)
                opposite = vertices[[x for x in cell_nodes if x not in local_glob][0]]
                if np.dot(nrm, gv.mean(axis=0) - opposite) < 0:
                    nrm = -nrm
                # Triangle ref weights sum to 1/2; |cross| = 2 * area.
                jxw = frule.weights * np.linalg.norm(cr)

            # Global P2 node ids on the face: its vertices + its edge midnodes.
            face_edges = (
                [tuple(sorted((local_idx[0], local_idx[1])))]
                if dim == 2
                else [
                    tuple(sorted((local_idx[a], local_idx[b])))
                    for a, b in ((0, 1), (1, 2), (2, 0))
                ]
            )
            mid_nodes = [int(elems_p2[e, edge_pos[fe]]) for fe in face_edges]

            f_elem.append(e)
            f_vnodes.append(list(local_glob))
            f_allnodes.append(list(local_glob) + mid_nodes)
            f_norm.append(nrm)
            f_jxw.append(jxw)
            f_p2v.append(t2.values)
            f_p2g.append(t2.grads)
            f_p1v.append(t1.values)

        out[bid] = BoundaryFaces(
            elem=np.asarray(f_elem, np.int32),
            vertex_nodes=np.asarray(f_vnodes, np.int32),
            all_nodes=np.asarray(f_allnodes, np.int32),
            normals=np.asarray(f_norm),
            jxw=np.asarray(f_jxw),
            p2_values=np.asarray(f_p2v),
            p2_ref_grads=np.asarray(f_p2g),
            p1_values=np.asarray(f_p1v),
        )
    return out


def locate_point(mesh: THMesh, point: np.ndarray) -> tuple[int, np.ndarray]:
    """Find the element containing ``point`` and its barycentric coords.

    Used for the Delta-p probes (reference: NavierStokes.cpp:871-912); returns
    the element maximizing the minimum barycentric coordinate, so points on
    element interfaces resolve deterministically.
    """
    p = np.asarray(point, np.float64)
    v0 = mesh.vertices[mesh.elems_p1[: mesh.n_el_real, 0]]
    J = (
        mesh.vertices[mesh.elems_p1[: mesh.n_el_real, 1:]] - v0[:, None, :]
    ).transpose(0, 2, 1)
    xi = np.linalg.solve(J, (p[None, :] - v0)[:, :, None])[:, :, 0]  # (n_el, dim)
    lam0 = 1.0 - xi.sum(axis=1)
    lam = np.concatenate([lam0[:, None], xi], axis=1)
    best = int(np.argmax(lam.min(axis=1)))
    if lam[best].min() < -1e-8:
        raise ValueError(f"point {point} not found in mesh (best bary {lam[best]})")
    return best, lam[best]


def pad_elements(mesh: THMesh, multiple: int) -> THMesh:
    """Pad element arrays to a multiple (for even device sharding).

    Padded elements reference node 0 and carry |det J| = 0, so their
    quadrature contributions vanish identically; jinv is identity to keep
    the arithmetic finite.
    """
    n = mesh.n_el
    target = ((n + multiple - 1) // multiple) * multiple
    pad = target - n
    if pad == 0:
        return mesh
    return dataclasses.replace(
        mesh,
        elems_p1=np.vstack([mesh.elems_p1, np.zeros((pad, mesh.n_en1), np.int32)]),
        elems_p2=np.vstack([mesh.elems_p2, np.zeros((pad, mesh.n_en2), np.int32)]),
        jinv=np.vstack([mesh.jinv, np.broadcast_to(np.eye(mesh.dim), (pad, mesh.dim, mesh.dim))]),
        detj=np.concatenate([mesh.detj, np.zeros(pad)]),
        diameters=np.concatenate([mesh.diameters, np.ones(pad)]),
    )


def load(path: str, n_face_q1d: int = 3) -> THMesh:
    """Read a gmsh v2.2 file and build the Taylor-Hood structure."""
    return build(gmsh_io.read_msh(path), n_face_q1d=n_face_q1d)
