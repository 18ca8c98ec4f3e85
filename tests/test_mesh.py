"""Mesh pipeline: gmsh ingest, P2 synthesis, boundary extraction, geometry."""

import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import gmsh_io, taylor_hood


def test_read_reference_mesh(mesh2d_path):
    raw = gmsh_io.read_msh(mesh2d_path)
    assert len(raw.points) == 888  # known node count of mesh-2D.msh
    assert raw.physical_names[101] == "inlet"
    assert raw.physical_names[104] == "cylinder"
    tris, tags = raw.cells_of_dim(2)
    assert tris.shape[1] == 3
    assert (tags == 201).all()


def test_taylor_hood_build(mesh2d):
    m = mesh2d
    assert m.dim == 2
    assert m.n_vertices == 888
    # Euler: midpoint count equals unique edge count.
    assert m.n_vnodes > m.n_vertices
    assert (m.detj > 0).all()
    # Velocity midpoint nodes actually sit at edge midpoints.
    e0 = m.elems_p2[0]
    v = m.vel_coords
    np.testing.assert_allclose(v[e0[3]], 0.5 * (v[e0[0]] + v[e0[1]]), atol=1e-12)
    np.testing.assert_allclose(v[e0[4]], 0.5 * (v[e0[1]] + v[e0[2]]), atol=1e-12)
    np.testing.assert_allclose(v[e0[5]], 0.5 * (v[e0[2]] + v[e0[0]]), atol=1e-12)


def test_total_area(mesh2d):
    """Channel minus cylinder: 2.2*0.41 - pi*0.05^2 (polygonal cylinder -> loose tol)."""
    area = np.sum(mesh2d.detj) * 0.5
    expected = 2.2 * 0.41 - np.pi * 0.05**2
    assert area == pytest.approx(expected, rel=2e-3)


def test_boundary_groups(mesh2d):
    m = mesh2d
    assert set(m.boundary) == {101, 102, 103, 104}
    # Inlet edge lengths sum to H.
    np.testing.assert_allclose(m.boundary[101].jxw.sum(), 0.41, rtol=1e-12)
    np.testing.assert_allclose(m.boundary[102].jxw.sum(), 0.41, rtol=1e-12)
    # Walls: two channel sides.
    np.testing.assert_allclose(m.boundary[103].jxw.sum(), 2 * 2.2, rtol=1e-12)
    # Cylinder: polygonal approximation of circumference 2*pi*0.05.
    assert m.boundary[104].jxw.sum() == pytest.approx(2 * np.pi * 0.05, rel=5e-3)
    # All inlet nodes sit at x = 0 (velocity P2 nodes included).
    nodes = m.velocity_nodes_of(101)
    np.testing.assert_allclose(m.vel_coords[nodes][:, 0], 0.0, atol=1e-9)
    # Cylinder nodes sit near the circle r = 0.05 around (0.2, 0.2).
    cyl = m.velocity_nodes_of(104)
    r = np.hypot(*(m.vel_coords[cyl] - np.array([0.2, 0.2])).T)
    assert abs(r - 0.05).max() < 5e-3


def test_boundary_normals_outward(mesh2d):
    m = mesh2d
    # Inlet normal is -x, outlet +x.
    np.testing.assert_allclose(m.boundary[101].normals, [[-1.0, 0.0]] * m.boundary[101].num_faces, atol=1e-9)
    np.testing.assert_allclose(m.boundary[102].normals, [[1.0, 0.0]] * m.boundary[102].num_faces, atol=1e-9)
    # Cylinder normals point toward the cylinder center (outward of fluid).
    bf = m.boundary[104]
    mids = m.vertices[bf.vertex_nodes].mean(axis=1)
    to_center = np.array([0.2, 0.2]) - mids
    dots = (bf.normals * to_center).sum(axis=1)
    assert (dots > 0).all()


def test_locate_probe_points(mesh2d):
    # Delta-p probes of the 2D benchmark (reference: NavierStokes.cpp:874-876).
    for pt in ([0.15, 0.2], [0.25, 0.2]):
        e, lam = taylor_hood.locate_point(mesh2d, np.array(pt))
        assert lam.min() > -1e-8
        verts = mesh2d.vertices[mesh2d.elems_p1[e]]
        np.testing.assert_allclose(lam @ verts, pt, atol=1e-10)


def test_pad_elements(mesh2d):
    m = taylor_hood.pad_elements(mesh2d, 128)
    assert m.n_el % 128 == 0
    assert m.n_el_real == mesh2d.n_el_real
    assert (m.detj[m.n_el_real :] == 0).all()


def test_geometric_repair(tmp_path, mesh2d_path):
    """Strip physical tags: geometric classification must recover them."""
    raw = gmsh_io.read_msh(mesh2d_path)
    lines, tags = raw.cells_of_dim(1)
    raw2 = gmsh_io.RawGmsh(
        points=raw.points,
        physical_names={},
        cells={1: (lines, np.zeros_like(tags)), 2: raw.cells[2]},
    )
    m = taylor_hood.build(raw2)
    m_ref = taylor_hood.load(mesh2d_path)
    for bid in (101, 102, 103, 104):
        assert m.boundary[bid].num_faces == m_ref.boundary[bid].num_faces
