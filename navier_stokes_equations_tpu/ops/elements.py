"""Lagrange simplex reference elements (P1, P2) for Taylor-Hood discretization.

TPU-native analog of deal.II ``FE_SimplexP<dim>(1|2)`` used by the reference
(reference: src/classes/NavierStokes.hpp:429-432).  Only the tables are
produced here (shape values / gradients / hessians at given reference points);
they become compile-time constants of the jitted assembly kernels.

Node ordering conventions (ours, not deal.II's — the mesh pipeline produces
connectivity in the same convention):

  Triangle P1: vertices 0,1,2 with barycentric (l0, l1, l2), l0 = 1-x-y.
  Triangle P2: vertices 0,1,2 then edge midpoints (0,1), (1,2), (2,0).
  Tet P1:      vertices 0,1,2,3, l0 = 1-x-y-z.
  Tet P2:      vertices 0..3 then edges (0,1),(0,2),(0,3),(1,2),(1,3),(2,3).
"""

from __future__ import annotations

import dataclasses

import numpy as np

# Edge orderings used for P2 node synthesis; must match mesh/taylor_hood.py.
TRI_EDGES = ((0, 1), (1, 2), (2, 0))
TET_EDGES = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))

# Local faces of the simplices, ordered so the remaining vertex is "opposite".
# face k of a triangle = edge opposite vertex k, etc.  We instead enumerate
# faces by their vertex tuples (the mesh pipeline matches on sorted tuples).
TRI_FACES = ((0, 1), (1, 2), (2, 0))
TET_FACES = ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3))


def _barycentric(points: np.ndarray) -> np.ndarray:
    """(nq, dim) reference coords -> (nq, dim+1) barycentric, l0 first."""
    pts = np.asarray(points, dtype=np.float64)
    l0 = 1.0 - pts.sum(axis=1, keepdims=True)
    return np.concatenate([l0, pts], axis=1)


def _bary_grads(dim: int) -> np.ndarray:
    """(dim+1, dim) constant gradients of barycentric coords."""
    g = np.zeros((dim + 1, dim))
    g[0, :] = -1.0
    g[1:, :] = np.eye(dim)
    return g


@dataclasses.dataclass(frozen=True)
class ShapeTables:
    """Shape function tables at a fixed set of reference points.

    values:   (nq, n_nodes)
    grads:    (nq, n_nodes, dim)      gradients in reference coordinates
    hessians: (nq, n_nodes, dim, dim) second derivatives in reference coords
              (constant across points for P2, zero for P1)
    nodes:    (n_nodes, dim) reference coordinates of the element nodes
    """

    values: np.ndarray
    grads: np.ndarray
    hessians: np.ndarray
    nodes: np.ndarray

    @property
    def n_nodes(self) -> int:
        return self.values.shape[1]

    @property
    def dim(self) -> int:
        return self.grads.shape[2]


def reference_nodes(dim: int, degree: int) -> np.ndarray:
    """Reference coordinates of P1/P2 nodes in our ordering."""
    verts = np.vstack([np.zeros((1, dim)), np.eye(dim)])
    if degree == 1:
        return verts
    if degree == 2:
        edges = TRI_EDGES if dim == 2 else TET_EDGES
        mids = np.array([(verts[a] + verts[b]) / 2.0 for a, b in edges])
        return np.vstack([verts, mids])
    raise ValueError(f"unsupported degree {degree}")


def shape_tables(dim: int, degree: int, points: np.ndarray) -> ShapeTables:
    """Evaluate P1 or P2 simplex shape functions at reference ``points``."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, dim)
    lam = _barycentric(pts)  # (nq, dim+1)
    dlam = _bary_grads(dim)  # (dim+1, dim)
    nq = pts.shape[0]
    nv = dim + 1

    if degree == 1:
        values = lam.copy()
        grads = np.broadcast_to(dlam, (nq, nv, dim)).copy()
        hess = np.zeros((nq, nv, dim, dim))
        return ShapeTables(values, grads, hess, reference_nodes(dim, 1))

    if degree != 2:
        raise ValueError(f"unsupported degree {degree}")

    edges = TRI_EDGES if dim == 2 else TET_EDGES
    nn = nv + len(edges)
    values = np.zeros((nq, nn))
    grads = np.zeros((nq, nn, dim))
    hess = np.zeros((nq, nn, dim, dim))

    # Vertex functions: l_i (2 l_i - 1).
    for i in range(nv):
        li = lam[:, i]
        gi = dlam[i]
        values[:, i] = li * (2.0 * li - 1.0)
        grads[:, i, :] = (4.0 * li - 1.0)[:, None] * gi[None, :]
        hess[:, i, :, :] = 4.0 * np.outer(gi, gi)[None, :, :]

    # Edge functions: 4 l_a l_b.
    for e, (a, b) in enumerate(edges):
        k = nv + e
        la, lb = lam[:, a], lam[:, b]
        ga, gb = dlam[a], dlam[b]
        values[:, k] = 4.0 * la * lb
        grads[:, k, :] = 4.0 * (lb[:, None] * ga[None, :] + la[:, None] * gb[None, :])
        hess[:, k, :, :] = 4.0 * (np.outer(ga, gb) + np.outer(gb, ga))[None, :, :]

    return ShapeTables(values, grads, hess, reference_nodes(dim, 2))


def face_points_to_cell(dim: int, face_vertices: tuple[int, ...], face_pts: np.ndarray) -> np.ndarray:
    """Map reference-face quadrature points to cell reference coordinates.

    ``face_vertices`` are local vertex indices of the cell spanning the face;
    ``face_pts`` are (nq, dim-1) coordinates on the reference (dim-1)-simplex.
    The face is parameterized barycentrically: x = sum_i mu_i V_i.
    """
    cell_verts = np.vstack([np.zeros((1, dim)), np.eye(dim)])
    fv = cell_verts[list(face_vertices)]  # (dim, dim) vertices of the face
    mu = _barycentric(np.asarray(face_pts).reshape(-1, dim - 1))  # (nq, dim)
    return mu @ fv
