"""Native (C++) ingest path: bit-identical to the Python fallback."""

import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import gmsh_io, native, taylor_hood
from navier_stokes_equations_tpu.ops import elements as el


pytestmark = pytest.mark.skipif(not native.available(), reason="libnsmesh.so not built")


def test_native_parse_matches_python(mesh2d_path):
    raw_n = native.read_msh_native(mesh2d_path)
    assert raw_n is not None
    # Force the Python path by parsing manually.
    import navier_stokes_equations_tpu.mesh.native as nat

    saved = nat._LIB
    nat._LIB = None
    try:
        raw_p = gmsh_io.read_msh(mesh2d_path)
    finally:
        nat._LIB = saved
    np.testing.assert_array_equal(raw_n["points"], raw_p.points)
    tris_p, tags_p = raw_p.cells_of_dim(2)
    np.testing.assert_array_equal(raw_n["tris"] - 1, tris_p)  # native keeps 1-based pre-remap
    lines_p, ltags_p = raw_p.cells_of_dim(1)
    np.testing.assert_array_equal(raw_n["line_tags"], ltags_p)


def test_native_read_through_gmsh_io(mesh2d_path):
    raw = gmsh_io.read_msh(mesh2d_path)  # goes through native when available
    assert len(raw.points) == 888
    assert raw.physical_names[101] == "inlet"
    m = taylor_hood.build(raw)
    assert m.n_vertices == 888


def test_native_unique_edges_matches_python():
    rng = np.random.default_rng(0)
    cells = rng.integers(0, 500, size=(1000, 4)).astype(np.int32)
    got = native.unique_edges_native(cells, el.TET_EDGES)
    assert got is not None
    # Python reference.
    import navier_stokes_equations_tpu.mesh.native as nat

    saved = nat._LIB
    nat._LIB = None
    try:
        want = taylor_hood._unique_edges(cells, el.TET_EDGES)
    finally:
        nat._LIB = saved
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
