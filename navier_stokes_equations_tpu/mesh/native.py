"""ctypes bindings for the native mesh-ingest library (csrc/libnsmesh.so).

Loaded lazily; every entry point has a NumPy fallback, so the package works
without the native build.  ``make -C navier_stokes_equations_tpu/csrc``
builds the library.  Results are bit-identical to the Python path
(tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "csrc", "libnsmesh.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.ns_msh_open.restype = ctypes.c_void_p
    lib.ns_msh_open.argtypes = [ctypes.c_char_p]
    lib.ns_msh_error.restype = ctypes.c_char_p
    lib.ns_msh_error.argtypes = [ctypes.c_void_p]
    for f in ("ns_msh_n_nodes", "ns_msh_n_tris", "ns_msh_n_tets", "ns_msh_n_lines"):
        getattr(lib, f).restype = ctypes.c_int64
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    lib.ns_msh_copy.restype = None
    lib.ns_msh_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 8
    lib.ns_msh_close.restype = None
    lib.ns_msh_close.argtypes = [ctypes.c_void_p]
    lib.ns_unique_edges.restype = ctypes.c_int64
    lib.ns_unique_edges.argtypes = [
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def read_msh_native(path: str):
    """Parse a v2.2 .msh file natively; returns the same dict-of-arrays shape
    the Python reader consumes, or None if the library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    h = lib.ns_msh_open(path.encode())
    try:
        err = lib.ns_msh_error(h)
        if err:
            raise ValueError(f"native msh parse failed: {err.decode()}")
        n_nodes = lib.ns_msh_n_nodes(h)
        n_tris = lib.ns_msh_n_tris(h)
        n_tets = lib.ns_msh_n_tets(h)
        n_lines = lib.ns_msh_n_lines(h)
        points = np.empty((n_nodes, 3), np.float64)
        node_ids = np.empty(n_nodes, np.int64)
        tris = np.empty((n_tris, 3), np.int32)
        tri_tags = np.empty(n_tris, np.int32)
        tets = np.empty((n_tets, 4), np.int32)
        tet_tags = np.empty(n_tets, np.int32)
        lines = np.empty((n_lines, 2), np.int32)
        line_tags = np.empty(n_lines, np.int32)
        lib.ns_msh_copy(
            h, _ptr(points), _ptr(node_ids), _ptr(tris), _ptr(tri_tags),
            _ptr(tets), _ptr(tet_tags), _ptr(lines), _ptr(line_tags),
        )
        return {
            "points": points,
            "node_ids": node_ids,
            "tris": tris, "tri_tags": tri_tags,
            "tets": tets, "tet_tags": tet_tags,
            "lines": lines, "line_tags": line_tags,
        }
    finally:
        lib.ns_msh_close(h)


def unique_edges_native(cells: np.ndarray, edge_list) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Native P2 edge dedup; mirrors taylor_hood._unique_edges."""
    lib = _lib()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, np.int32)
    n_el, nv = cells.shape
    el = np.ascontiguousarray(np.asarray(edge_list, np.int32))
    n_eper = len(el)
    uniq = np.empty((n_el * n_eper, 2), np.int32)
    idx = np.empty(n_el * n_eper, np.int64)
    n_unique = lib.ns_unique_edges(
        n_el, nv, _ptr(cells), n_eper, _ptr(el), _ptr(uniq), _ptr(idx)
    )
    return uniq[:n_unique].copy(), idx.reshape(n_el, n_eper)
