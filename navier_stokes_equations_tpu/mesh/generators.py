"""Native mesh generators for the benchmark geometries.

The reference generates its meshes with gmsh .geo scripts (reference:
meshes/mesh-2D*.geo, meshes/mesh-3D*.geo; README.md:41-55) and does not
commit the 3D .msh files (.gitignore:44).  gmsh is not a runtime dependency
here: these generators reproduce the benchmark domains natively —

  * 2D: channel [0, 2.2] x [0, 0.41] with a circular hole r=0.05 at
    (0.2, 0.2)  (reference: meshes/mesh-2D.geo:2-8);
  * 3D: box 0.41 x 0.41 x 2.5 (flow along z) minus a cylinder with axis
    along x at (y, z) = (0.2, 0.45)  (reference: meshes/mesh-3D-5.geo:9-15),
    built by meshing the (y, z) cross-section and extruding along x with a
    conforming prism -> 3-tet split (Dompierre et al. rotation rules).

Method: graded Cartesian background grid, nodes near the circle snapped onto
it, interior cells removed ("snapped-Cartesian" boundary fitting).  Boundary
ids follow the reference convention and are assigned by the same geometric
classification used for boundary-id repair.

Tet splitting compatibility and element quality are covered by tests
(conformity: every interior face shared by exactly two cells).
"""

from __future__ import annotations

import numpy as np

from . import gmsh_io


def graded_coords(a: float, b: float, fine_lo: float, fine_hi: float, h_far: float, h_fine: float, growth: float = 0.18) -> np.ndarray:
    """1D coordinates on [a, b], spacing h_fine inside [fine_lo, fine_hi],
    growing smoothly to h_far away from it."""

    def h_at(x):
        if fine_lo <= x <= fine_hi:
            return h_fine
        d = (fine_lo - x) if x < fine_lo else (x - fine_hi)
        return min(h_far, h_fine + growth * d)

    xs = [a]
    while xs[-1] < b - 1e-12:
        xs.append(xs[-1] + h_at(xs[-1]))
    xs = np.asarray(xs)
    # Rescale to land exactly on b.
    xs = a + (xs - a) * (b - a) / (xs[-1] - a)
    return xs


def _triangulate_grid(nx: int, ny: int) -> np.ndarray:
    """Union-jack triangulation of an (nx+1) x (ny+1) node grid."""
    tris = []
    for i in range(nx):
        for j in range(ny):
            n00 = i * (ny + 1) + j
            n10 = (i + 1) * (ny + 1) + j
            n01 = i * (ny + 1) + j + 1
            n11 = (i + 1) * (ny + 1) + j + 1
            if (i + j) % 2 == 0:
                tris.append((n00, n10, n11))
                tris.append((n00, n11, n01))
            else:
                tris.append((n00, n10, n01))
                tris.append((n10, n11, n01))
    return np.asarray(tris, np.int64)


def rect_with_hole_2d(
    lx: float,
    ly: float,
    cx: float,
    cy: float,
    r: float,
    h_far: float,
    h_cyl: float,
    refine_pad: float = 2.0,
    wake_refine: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Triangulated rectangle with a snapped circular hole.

    Returns (points (n, 2), triangles (m, 3)).  ``wake_refine`` > 0 keeps an
    intermediate resolution in the wake strip downstream of the cylinder.
    """
    pad = refine_pad * r
    xs = graded_coords(0.0, lx, cx - pad, cx + pad + wake_refine, h_far, h_cyl)
    ys = graded_coords(0.0, ly, cy - pad, cy + pad, h_far, h_cyl)
    nx, ny = len(xs) - 1, len(ys) - 1
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    tris = _triangulate_grid(nx, ny)

    # Local spacing at each node (sliver thresholds).
    hx = np.gradient(xs)
    hy = np.gradient(ys)
    h_loc = np.minimum(hx[:, None], hy[None, :]).ravel()

    def _area2(t):
        v = pts[t]
        return (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1]) - (
            v[:, 1, 1] - v[:, 0, 1]
        ) * (v[:, 2, 0] - v[:, 0, 0])

    # Carve first, then project the hole boundary onto the circle; iterate
    # because dropping degenerate triangles can expose new boundary nodes.
    for _ in range(4):
        d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
        inside = d[tris].min(axis=1) < r * (1.0 - 1e-9)
        cent = pts[tris].mean(axis=1)
        cent_in = np.hypot(cent[:, 0] - cx, cent[:, 1] - cy) < r
        sliver = np.abs(_area2(tris)) < 0.08 * h_loc[tris].min(axis=1) ** 2
        keep = ~(inside | cent_in | sliver)
        if keep.all():
            break
        tris = tris[keep]

        # Hole-boundary nodes: endpoints of once-seen edges near the circle.
        edges = np.sort(
            np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]]),
            axis=1,
        )
        uniq, cnt = np.unique(edges, axis=0, return_counts=True)
        bnodes = np.unique(uniq[cnt == 1].ravel())
        d_b = np.hypot(pts[bnodes, 0] - cx, pts[bnodes, 1] - cy)
        near = np.abs(d_b - r) < 1.5 * h_loc[bnodes]
        proj = bnodes[near]
        theta = np.arctan2(pts[proj, 1] - cy, pts[proj, 0] - cx)
        pts[proj, 0] = cx + r * np.cos(theta)
        pts[proj, 1] = cy + r * np.sin(theta)

    d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
    assert d[tris].min() > r * (1 - 1e-9), "hole carving left interior nodes"
    assert np.abs(_area2(tris)).min() > 0, "degenerate triangle survived"

    # Compact the node set.
    used = np.zeros(len(pts), bool)
    used[tris.ravel()] = True
    new_idx = np.cumsum(used) - 1
    return pts[used], new_idx[tris].astype(np.int64)


def channel_cylinder_2d(h_far: float = 0.05, h_cyl: float = 0.005, wake_refine: float = 0.3) -> gmsh_io.RawGmsh:
    """The DFG 2D benchmark domain as a RawGmsh (boundary ids by geometry)."""
    pts, tris = rect_with_hole_2d(2.2, 0.41, 0.2, 0.2, 0.05, h_far, h_cyl, wake_refine=wake_refine)
    pts3 = np.concatenate([pts, np.zeros((len(pts), 1))], axis=1)
    return gmsh_io.RawGmsh(
        points=pts3,
        physical_names={101: "inlet", 102: "outlet", 103: "walls", 104: "cylinder"},
        cells={2: (tris.astype(np.int32), np.full(len(tris), 201, np.int32))},
    )


def rect_2d(lx: float, ly: float, nx: int, ny: int) -> gmsh_io.RawGmsh:
    """Plain channel (no hole): unit tests and multi-chip dry runs."""
    xs = np.linspace(0, lx, nx + 1)
    ys = np.linspace(0, ly, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    tris = _triangulate_grid(nx, ny)
    # Tag the outer boundary explicitly (the geometric repair assumes the
    # DFG geometry, which this is not).
    edges = {}
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            key = (min(a, b), max(a, b))
            edges[key] = edges.get(key, 0) + 1
    bedges = np.array([k for k, c in edges.items() if c == 1], np.int32)
    mid = pts[bedges].mean(axis=1)
    tags = np.full(len(bedges), 103, np.int32)
    tags[np.abs(mid[:, 0]) < 1e-12] = 101
    tags[np.abs(mid[:, 0] - lx) < 1e-12] = 102
    pts3 = np.concatenate([pts, np.zeros((len(pts), 1))], axis=1)
    return gmsh_io.RawGmsh(
        points=pts3,
        physical_names={101: "inlet", 102: "outlet", 103: "walls"},
        cells={
            1: (bedges, tags),
            2: (tris.astype(np.int32), np.full(len(tris), 201, np.int32)),
        },
    )


def _split_prisms_to_tets(prisms: np.ndarray) -> np.ndarray:
    """Conforming 3-tet split of each prism (bottom v0 v1 v2, top v3 v4 v5).

    Uses the indirection rules of Dompierre et al. (1999): rotate each prism
    so its globally smallest vertex is first, then pick the diagonal of the
    opposite quad face through the smaller remaining index.  Neighboring
    prisms then agree on every shared quad-face diagonal.
    """
    rot_bottom = np.array([[0, 1, 2, 3, 4, 5], [1, 2, 0, 4, 5, 3], [2, 0, 1, 5, 3, 4]])
    out = np.empty((len(prisms) * 3, 4), np.int64)
    for n, pr in enumerate(prisms):
        k = int(np.argmin(pr))
        if k < 3:
            p = pr[rot_bottom[k]]
        else:
            # Smallest on top: mirror the prism (swap decks, reverse to keep
            # a right-handed numbering), then rotate.
            m = pr[[3, 5, 4, 0, 2, 1]]
            k2 = int(np.argmin(m[:3]))
            p = m[rot_bottom[k2]]
        v0, v1, v2, v3, v4, v5 = p
        if min(v1, v5) < min(v2, v4):
            tets = [(v0, v1, v2, v5), (v0, v1, v5, v4), (v0, v4, v5, v3)]
        else:
            tets = [(v0, v1, v2, v4), (v0, v4, v2, v5), (v0, v4, v5, v3)]
        out[3 * n : 3 * n + 3] = tets
    return out


def channel_cylinder_3d(h_far: float = 0.08, h_cyl: float = 0.02, n_layers: int | None = None) -> gmsh_io.RawGmsh:
    """The 3D-Z benchmark domain: 0.41 x 0.41 x 2.5, cylinder along x.

    Cross-section (y, z) in [0, 0.41] x [0, 2.5] with hole at (0.2, 0.45),
    extruded along x (0 .. 0.41).  Boundary ids resolved geometrically by
    the mesh builder (inlet z=0 -> 101, outlet z=2.5 -> 102, cylinder -> 103,
    walls -> 104, matching NavierStokes.hpp:518-521 for dim=3).
    """
    pts2, tris2 = rect_with_hole_2d(
        0.41, 2.5, 0.2, 0.45, 0.05, h_far, h_cyl, wake_refine=0.2
    )
    # NOTE: the 2D mesh lives in (y, z); build 3D points as (x, y, z).
    if n_layers is None:
        n_layers = max(2, int(round(0.41 / h_far)))
    xs = np.linspace(0.0, 0.41, n_layers + 1)
    n2 = len(pts2)
    pts3 = np.empty((len(xs) * n2, 3))
    for k, x in enumerate(xs):
        pts3[k * n2 : (k + 1) * n2, 0] = x
        pts3[k * n2 : (k + 1) * n2, 1] = pts2[:, 0]
        pts3[k * n2 : (k + 1) * n2, 2] = pts2[:, 1]

    prisms = []
    for k in range(len(xs) - 1):
        lo = k * n2
        hi = (k + 1) * n2
        pr = np.concatenate([tris2 + lo, tris2 + hi], axis=1)
        prisms.append(pr)
    prisms = np.concatenate(prisms, axis=0)
    tets = _split_prisms_to_tets(prisms)

    return gmsh_io.RawGmsh(
        points=pts3,
        physical_names={101: "inlet", 102: "outlet", 103: "cylinder", 104: "walls"},
        cells={3: (tets.astype(np.int32), np.full(len(tets), 201, np.int32))},
    )
