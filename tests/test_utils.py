"""Utilities: checkpoint round-trip, VTU validity, logger formats."""

import io
import os

import numpy as np
import pytest

from navier_stokes_equations_tpu.models import solver, test_cases
from navier_stokes_equations_tpu.utils import checkpoint as ckpt
from navier_stokes_equations_tpu.utils import logging as nslog
from navier_stokes_equations_tpu.utils import vtu


import dataclasses


@pytest.fixture(scope="module")
def short_run(mesh2d_path):
    cfg = dataclasses.replace(test_cases.make("2D-1"), dtype="float64")
    s = solver.NavierStokesSolver(cfg, mesh2d_path)
    state, hist = s.run(n_steps=3)
    return s, state, hist


def test_checkpoint_roundtrip(short_run, tmp_path):
    s, state, hist = short_run
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, state)
    restored, _ = ckpt.load(path, dtype=s.dtype)
    np.testing.assert_array_equal(np.asarray(state.x_old), np.asarray(restored.x_old))
    assert int(restored.step) == int(state.step)

    # Resuming reproduces the exact continuation.
    s2 = solver.NavierStokesSolver(s.cfg, s.mesh)
    _, hist_a = s.run(n_steps=2, state=state)
    restored2, _ = ckpt.load(path, dtype=s.dtype)
    _, hist_b = s2.run(n_steps=2, state=restored2)
    for a, b in zip(hist_a, hist_b):
        assert a["Cd"] == pytest.approx(b["Cd"], abs=1e-14)
        assert a["DeltaP"] == pytest.approx(b["DeltaP"], abs=1e-14)


def test_vtu_output(short_run, tmp_path):
    s, state, _ = short_run
    u, p = s.fe.split(state.x_old)
    path = str(tmp_path / "out.vtu")
    vtu.write_vtu(path, s.mesh, np.asarray(u), np.asarray(p))
    txt = open(path).read()
    assert "UnstructuredGrid" in txt
    assert 'Name="velocity"' in txt and 'Name="pressure"' in txt
    # Quadratic cells: points = all P2 nodes (vertices + edge midpoints).
    assert f'NumberOfPoints="{s.mesh.n_vnodes}"' in txt
    assert os.path.getsize(path) > 1000
    vtu.write_pvd(str(tmp_path / "o.pvd"), [(0.1, "out.vtu")])
    assert "Collection" in open(tmp_path / "o.pvd").read()


def test_logger_forces_format(short_run, tmp_path):
    s, _, hist = short_run
    stream = io.StringIO()
    path = str(tmp_path / "forces.txt")
    with nslog.RunLogger(forces_path=path, stream=stream) as lg:
        lg.log_setup(s)
        for rec in hist:
            lg.log_step(rec)
    lines = open(path).read().strip().split("\n")
    assert lines[0] == "Time\tCd\tCl\tDeltaP"
    assert len(lines) == 1 + len(hist)
    assert len(lines[1].split("\t")) == 4
    out = stream.getvalue()
    assert "Time step 1" in out and "Cd=" in out and "GMRES:" in out
