"""Native mesh generators: geometry, conformity, boundary classification."""

import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import generators, taylor_hood


def test_rect_mesh():
    raw = generators.rect_2d(2.0, 1.0, 8, 4)
    m = taylor_hood.build(raw, repair_boundary_ids=False)
    assert m.dim == 2
    np.testing.assert_allclose(m.detj.sum() * 0.5, 2.0, rtol=1e-12)
    np.testing.assert_allclose(m.boundary[101].jxw.sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose(m.boundary[102].jxw.sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose(m.boundary[103].jxw.sum(), 4.0, rtol=1e-12)


def test_channel_cylinder_2d_geometry():
    raw = generators.channel_cylinder_2d(h_far=0.05, h_cyl=0.008)
    m = taylor_hood.build(raw)
    area = m.detj.sum() * 0.5
    expected = 2.2 * 0.41 - np.pi * 0.05**2
    assert area == pytest.approx(expected, rel=5e-3)
    assert set(m.boundary) == {101, 102, 103, 104}
    # Cylinder boundary length ~ circumference.
    assert m.boundary[104].jxw.sum() == pytest.approx(2 * np.pi * 0.05, rel=2e-2)
    # All cylinder *vertices* lie exactly on the circle; P2 midedge nodes sit
    # at chord midpoints (straight-sided elements, same as the reference's
    # MappingFE(P1)), so they are O(h^2/r) inside.
    cyl_v = m.pressure_nodes_of(104)
    rr = np.hypot(*(m.vertices[cyl_v] - np.array([0.2, 0.2])).T)
    np.testing.assert_allclose(rr, 0.05, atol=1e-9)
    cyl = m.velocity_nodes_of(104)
    rr2 = np.hypot(*(m.vel_coords[cyl] - np.array([0.2, 0.2])).T)
    assert np.abs(rr2 - 0.05).max() < 5e-4
    # Element quality: no degenerate cells.
    hmin = m.detj.min()
    assert hmin > 0


def _face_conformity(cells, n_vert_per_face_ids):
    faces = {}
    for c in cells:
        for f in n_vert_per_face_ids:
            key = tuple(sorted(int(c[i]) for i in f))
            faces[key] = faces.get(key, 0) + 1
    counts = np.array(list(faces.values()))
    return counts


def test_prism_split_conformity():
    """Every interior tet face shared by exactly 2 tets, boundary by 1."""
    raw = generators.channel_cylinder_3d(h_far=0.15, h_cyl=0.05, n_layers=3)
    tets, _ = raw.cells_of_dim(3)
    counts = _face_conformity(tets, [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)])
    assert set(np.unique(counts)) <= {1, 2}


def test_channel_cylinder_3d_geometry():
    raw = generators.channel_cylinder_3d(h_far=0.1, h_cyl=0.035, n_layers=4)
    m = taylor_hood.build(raw)
    assert m.dim == 3
    vol = m.detj.sum() / 6.0
    expected = 0.41 * 0.41 * 2.5 - np.pi * 0.05**2 * 0.41
    assert vol == pytest.approx(expected, rel=1e-2)
    assert set(m.boundary) == {101, 102, 103, 104}
    # Inlet/outlet areas = 0.41^2 minus nothing (cylinder does not touch them).
    assert m.boundary[101].jxw.sum() == pytest.approx(0.41**2, rel=1e-12)
    assert m.boundary[102].jxw.sum() == pytest.approx(0.41**2, rel=1e-12)
    # Cylinder lateral area ~ 2 pi r * 0.41.
    assert m.boundary[103].jxw.sum() == pytest.approx(2 * np.pi * 0.05 * 0.41, rel=3e-2)
    # 3D probes (reference: cpp:878-879) are inside the mesh.
    from navier_stokes_equations_tpu.ops import fe_arrays, functionals

    fe = fe_arrays.build_fe_arrays(m)
    pt = functionals.build_probe_tables(m)
    assert pt.bary.shape == (2, 4)


def test_graded_coords():
    xs = generators.graded_coords(0.0, 2.2, 0.1, 0.5, 0.1, 0.01)
    assert xs[0] == 0.0 and xs[-1] == pytest.approx(2.2)
    d = np.diff(xs)
    assert d.min() > 0.005 and d.max() < 0.15
    # Fine region actually fine.
    fine = d[(xs[:-1] > 0.1) & (xs[:-1] < 0.5)]
    assert fine.max() < 0.02
