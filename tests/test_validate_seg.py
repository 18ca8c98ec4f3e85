"""Segmented long-rung driver (scripts/validate.py run_segment).

The at-scale validation rungs take longer than one build round; the
segmented runner advances them in bounded resumable chunks with committed
checkpoints + partial traces.  This exercises the full cycle on a tiny
CPU case: fresh start, checkpointed resume, a phase-boundary flag switch,
and promotion of the partial trace to its final name.
"""

import importlib.util
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_validate():
    spec = importlib.util.spec_from_file_location(
        "validate", os.path.join(REPO, "scripts", "validate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_run_segment_cycle(tmp_path, monkeypatch):
    validate = _load_validate()
    name = "tiny_seg_test"
    spec = {
        "args": ["--case", "2D-2", "--mesh",
                 "/root/reference/meshes/mesh-2D.msh",
                 "--deltat", "0.01", "--platform", "cpu",
                 "--dtype", "float64"],
        # Phase boundary at 4 exercises the flag switch mid-rung.
        "phases": [(0, []), (4, ["--no-warm-start"])],
        "total_steps": 6,
        "seg_steps": 4,
        "ckpt": str(tmp_path / "ckpt/tiny.npz"),
        "partial": str(tmp_path / "partial.txt"),
        "final": str(tmp_path / "final.txt"),
    }
    # Absolute paths make os.path.join(REPO, ...) in run_segment a no-op,
    # so the whole cycle stays inside tmp_path.
    monkeypatch.setitem(validate.SEGMENTED, name, spec)

    # Segment 1: fresh start; capped at the phase boundary (4 < seg?
    # seg_steps=4 equals the boundary so steps 0->4).
    validate.run_segment(name)
    assert os.path.exists(spec["ckpt"])
    with np.load(spec["ckpt"]) as z:
        assert int(z["step"]) == 4
    rows1 = open(spec["partial"]).readlines()
    assert rows1[0].startswith("Time") and len(rows1) == 1 + 4

    # Segment 2: resumes at 4, phase-2 flags, finishes and promotes.
    validate.run_segment(name)
    assert not os.path.exists(spec["ckpt"])
    assert not os.path.exists(spec["partial"])
    rows = open(spec["final"]).readlines()
    assert len(rows) == 1 + 6
    times = [float(r.split("\t")[0]) for r in rows[1:]]
    assert times == pytest.approx([0.01 * (i + 1) for i in range(6)])


def test_segment_specs_consistent():
    validate = _load_validate()
    for name, spec in validate.SEGMENTED.items():
        assert spec["total_steps"] > 0 and spec["seg_steps"] > 0
        for ps, flags in spec.get("phases", []):
            assert 0 <= ps < spec["total_steps"]
            assert isinstance(flags, list)
        assert spec["ckpt"].startswith("validation/checkpoints/")
        assert spec["partial"].startswith("validation/partial_")
