"""Test configuration: force CPU with a virtual 8-device mesh and f64.

Sharding tests validate the multi-chip path on a virtual device mesh
(xla_force_host_platform_device_count); numerics tests use float64 on CPU as
ground truth for the TPU float32 path.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin overrides JAX_PLATFORMS from the environment; the
# config update below reliably pins tests to the host CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib
import shutil
import subprocess

import pytest

REFERENCE_MESHES = pathlib.Path("/root/reference/meshes")
REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]

# Build the native mesh-ingest library so tests/test_native.py actually
# runs (mesh/native.py caches its load attempt at first use, so this must
# happen at conftest import time, before any test imports the package).
_CSRC = REPO_ROOT / "navier_stokes_equations_tpu" / "csrc"
if not (_CSRC / "libnsmesh.so").exists() and shutil.which("make"):
    try:
        subprocess.run(
            ["make", "-C", str(_CSRC)], check=True,
            capture_output=True, timeout=300,
        )
    except Exception as e:  # no toolchain: native tests skip as before
        print(f"conftest: native build skipped ({e})")


@pytest.fixture(scope="session")
def mesh2d_path():
    p = REFERENCE_MESHES / "mesh-2D.msh"
    if not p.exists():
        pytest.skip("reference mesh-2D.msh not available")
    return str(p)


@pytest.fixture(scope="session")
def mesh2d(mesh2d_path):
    from navier_stokes_equations_tpu.mesh import taylor_hood

    return taylor_hood.load(mesh2d_path)
