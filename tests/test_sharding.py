"""SPMD domain decomposition: N-device results match single-device results."""

import dataclasses

import jax
import numpy as np
import pytest

from navier_stokes_equations_tpu.mesh import generators, taylor_hood
from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.parallel import sharding


N_DEV = 8


@pytest.fixture(scope="module")
def small_mesh():
    return taylor_hood.build(generators.rect_2d(2.2, 0.41, 22, 5))


def _cfg():
    cfg = test_cases.make("2D-2", deltat=0.02)
    return dataclasses.replace(cfg, dtype="float64")


def test_device_count():
    assert jax.device_count() >= N_DEV  # conftest forces 8 virtual CPU devices


def test_rcb_partition_contiguity(small_mesh):
    m = sharding.partition_mesh(small_mesh, N_DEV)
    cent = m.vertices[m.elems_p1[: m.n_el_real]].mean(axis=1)
    n = m.n_el_real // N_DEV
    # Chunks are spatially compact: each chunk's bbox area is much smaller
    # than the domain.
    domain_area = 2.2 * 0.41
    for k in range(N_DEV):
        c = cent[k * n : (k + 1) * n]
        if len(c) == 0:
            continue
        bbox = (c[:, 0].max() - c[:, 0].min()) * (c[:, 1].max() - c[:, 1].min())
        assert bbox < 0.6 * domain_area


def test_sharded_step_matches_single(small_mesh):
    cfg = _cfg()
    mesh_p = sharding.partition_mesh(small_mesh, N_DEV)

    s1 = solver.NavierStokesSolver(cfg, mesh_p, pad_multiple=N_DEV)
    _, hist1 = s1.run(n_steps=3)

    s2 = solver.NavierStokesSolver(cfg, mesh_p, pad_multiple=N_DEV)
    sharding.shard_solver(s2, N_DEV)
    _, hist2 = s2.run(n_steps=3)

    for a, b in zip(hist1, hist2):
        assert a["Cd"] == pytest.approx(b["Cd"], rel=1e-10, abs=1e-12)
        assert a["Cl"] == pytest.approx(b["Cl"], rel=1e-10, abs=1e-12)
        assert a["DeltaP"] == pytest.approx(b["DeltaP"], rel=1e-10, abs=1e-12)


def test_padding_is_inert(small_mesh):
    cfg = _cfg()
    s1 = solver.NavierStokesSolver(cfg, small_mesh)
    s2 = solver.NavierStokesSolver(cfg, small_mesh, pad_multiple=64)
    assert s2.fe.n_el % 64 == 0 and s2.fe.n_el != s1.fe.n_el
    _, h1 = s1.run(n_steps=2)
    _, h2 = s2.run(n_steps=2)
    for a, b in zip(h1, h2):
        assert a["Cd"] == pytest.approx(b["Cd"], rel=1e-12, abs=1e-14)
        assert a["DeltaP"] == pytest.approx(b["DeltaP"], rel=1e-12, abs=1e-14)
