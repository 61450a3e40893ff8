"""Mesh decimation: ctypes binding to the native QEM collapser.

BOP models have 10k-200k triangles; the TPU rasterizer is linear in triangle
count and a 30x30 crop render resolves ~200. Decimating ahead of time is the
single biggest real-dataset throughput lever. The native library builds
lazily with g++ on first use (cached under native/); a pure-NumPy
vertex-clustering fallback keeps everything working without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .mesh_io import Mesh

__all__ = ["decimate", "triangle_budget_for_resolution"]

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libdecimate.so"
_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB_PATH.exists() or (
            _LIB_PATH.stat().st_mtime < (_NATIVE_DIR / "decimate.cpp").stat().st_mtime
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", str(_LIB_PATH), str(_NATIVE_DIR / "decimate.cpp")],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.decimate_mesh.restype = ctypes.c_int
        lib.decimate_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def triangle_budget_for_resolution(width: int, height: int, oversample: float = 1.0) -> int:
    """Triangle budget so that triangles stay around the pixel scale of the
    render: ~oversample triangles per visible pixel (half the budget is
    backfacing). The kernel's cost is linear in faces (v5e: 5.7 us/pose at
    1280 faces/30x30, 14 us at 5120), so every extra factor here directly
    divides the SMC steps a time budget affords; at oversample=1 a 30x30
    crop gets 1800 triangles, ~2 per visible object pixel — already at the
    sub-pixel-triangle regime where finer meshes cannot change the render."""
    return int(2 * oversample * width * height)


def decimate(mesh: Mesh, target_faces: int) -> Mesh:
    """Quadric-error-metric decimation to ~target_faces triangles."""
    if mesh.n_faces <= target_faces:
        return mesh
    lib = _load_library()
    if lib is None:
        return _cluster_decimate(mesh, target_faces)

    verts = np.ascontiguousarray(mesh.vertices, np.float32)
    faces = np.ascontiguousarray(mesh.faces, np.int32)
    out_verts = np.empty_like(verts)
    out_faces = np.empty_like(faces)
    out_nv = ctypes.c_int(0)
    out_nf = ctypes.c_int(0)
    ret = lib.decimate_mesh(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), mesh.n_vertices,
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), mesh.n_faces,
        int(target_faces),
        out_verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(out_nv),
        out_faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.byref(out_nf),
    )
    if ret != 0 or out_nf.value < 4:
        return _cluster_decimate(mesh, target_faces)
    return Mesh(out_verts[: out_nv.value].copy(), out_faces[: out_nf.value].copy())


def _cluster_decimate(mesh: Mesh, target_faces: int) -> Mesh:
    """Fallback: uniform-grid vertex clustering (no toolchain needed)."""
    v = mesh.vertices
    lo, hi = v.min(0), v.max(0)
    span = np.maximum(hi - lo, 1e-9)
    # grid resolution from the face budget: cells ~ target_faces / 2
    res = max(int(np.cbrt(target_faces / 2.0)), 2)
    cell = np.minimum(((v - lo) / span * res).astype(int), res - 1)
    key = cell[:, 0] * res * res + cell[:, 1] * res + cell[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    new_v = np.zeros((len(uniq), 3), np.float64)
    counts = np.bincount(inv)
    for d in range(3):
        new_v[:, d] = np.bincount(inv, weights=v[:, d]) / counts
    f = inv[mesh.faces]
    keep = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    return Mesh(new_v.astype(np.float32), f[keep].astype(np.int32))
