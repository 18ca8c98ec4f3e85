"""SPMD domain decomposition over a device mesh.

The reference scales by partitioning the triangulation over MPI ranks with
ghosted Trilinos vectors and ``compress(add)`` accumulation (reference:
NavierStokes.cpp:56-61, 213-220, 527-528).  The TPU-native equivalent:

  * element arrays (connectivity, geometry, per-step element matrices) are
    sharded along the element axis of a 1D ``jax.sharding.Mesh`` — the
    spatial-domain-decomposition analog of data parallelism;
  * DoF vectors stay replicated; the scatter-add of per-shard element
    contributions becomes a partial segment-sum + XLA all-reduce over ICI —
    exactly ``compress(VectorOperation::add)``;
  * GMRES dot products act on replicated vectors (no extra collectives);
  * nothing else changes: the same jitted step runs on 1 chip or N chips,
    with XLA's SPMD partitioner inserting the collectives.

Element ordering is spatially partitioned (recursive coordinate bisection)
before sharding so each shard is a contiguous spatial block — keeping the
all-reduced update volume per shard local and ICI-friendly.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mesh.taylor_hood import THMesh
from ..ops.fe_arrays import FEArrays

# FEArrays fields sharded along the element axis; all others are replicated.
ELEMENT_AXIS_FIELDS = (
    "elems_p2",
    "elems_p1",
    "elem_dofs",
    "jinv",
    "jxw",
    "diameters",
    "qpoints",
    "kp_e",
    "mp_e",
)


def make_device_mesh(n_devices: int | None = None, axis: str = "elems") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def rcb_order(centroids: np.ndarray, n_parts: int) -> np.ndarray:
    """Recursive coordinate bisection: element permutation such that equal
    contiguous chunks are spatially compact."""
    n = len(centroids)
    idx = np.arange(n)

    def rec(ids, parts):
        if parts == 1 or len(ids) <= 1:
            return [ids]
        c = centroids[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = ids[np.argsort(c[:, axis], kind="stable")]
        left_parts = parts // 2
        split = int(round(len(ids) * left_parts / parts))
        return rec(order[:split], left_parts) + rec(order[split:], parts - left_parts)

    chunks = rec(idx, n_parts)
    return np.concatenate(chunks)


def rcb_partition(centroids: np.ndarray, n_parts: int) -> list:
    """Recursive coordinate bisection PARTITION: per-part element-id lists.

    The general-partition analog of the reference's
    ``GridTools::partition_triangulation`` (NavierStokes.cpp:56-61) —
    spatially compact, balanced parts with an arbitrary neighbor graph
    (the halo layout's multi-round exchange handles any partition)."""
    n = len(centroids)
    idx = np.arange(n)

    def rec(ids, parts):
        if parts == 1 or len(ids) <= 1:
            return [ids]
        c = centroids[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = ids[np.argsort(c[:, axis], kind="stable")]
        left_parts = parts // 2
        split = int(round(len(ids) * left_parts / parts))
        return rec(order[:split], left_parts) + rec(order[split:], parts - left_parts)

    return rec(idx, n_parts)


def partition_mesh(mesh: THMesh, n_parts: int) -> THMesh:
    """Reorder elements by RCB so contiguous equal chunks are spatial blocks."""
    cent = mesh.vertices[mesh.elems_p1[: mesh.n_el_real]].mean(axis=1)
    perm = rcb_order(cent, n_parts)
    full_perm = np.concatenate([perm, np.arange(mesh.n_el_real, mesh.n_el)])
    return dataclasses.replace(
        mesh,
        elems_p1=mesh.elems_p1[full_perm],
        elems_p2=mesh.elems_p2[full_perm],
        jinv=mesh.jinv[full_perm],
        detj=mesh.detj[full_perm],
        diameters=mesh.diameters[full_perm],
        boundary={
            bid: dataclasses.replace(
                bf, elem=np.argsort(full_perm).astype(np.int32)[bf.elem]
            )
            for bid, bf in mesh.boundary.items()
        },
    )


def shard_fe_arrays(fe: FEArrays, device_mesh: Mesh, axis: str = "elems") -> FEArrays:
    """Place element-axis arrays as NamedSharding(P(axis)), rest replicated."""
    n_dev = device_mesh.devices.size
    if fe.n_el % n_dev != 0:
        raise ValueError(
            f"n_el={fe.n_el} not divisible by {n_dev} devices; build the "
            f"solver with pad_multiple={n_dev}"
        )
    sharded = NamedSharding(device_mesh, P(axis))
    replicated = NamedSharding(device_mesh, P())
    updates = {}
    for f in dataclasses.fields(fe):
        if f.metadata.get("static"):
            continue
        arr = getattr(fe, f.name)
        spec = sharded if f.name in ELEMENT_AXIS_FIELDS else replicated
        updates[f.name] = jax.device_put(arr, spec)
    # The transpose-map gather path indexes across all elements; sharded
    # execution accumulates with scatter-add + all-reduce instead.
    updates["use_gather_scatter"] = False
    return dataclasses.replace(fe, **updates)


def shard_solver(solver, device_mesh: Mesh | int | None = None):
    """Switch a built NavierStokesSolver to SPMD execution in place.

    Requires the solver to have been constructed with
    ``pad_multiple = n_devices`` (padded elements are inert, so padding
    never changes results).
    """
    if device_mesh is None or isinstance(device_mesh, int):
        device_mesh = make_device_mesh(device_mesh)
    solver.fe = shard_fe_arrays(solver.fe, device_mesh)
    solver.device_mesh = device_mesh
    return solver
