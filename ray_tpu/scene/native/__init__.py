"""Native (C++) scene-compile acceleration.

Compiles ``bvh_builder.cpp`` with g++ on first use (cached under
``build/``) and exposes it via ctypes.  Falls back gracefully: callers
check :func:`available` and use the numpy builder otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))), "build")
    os.makedirs(d, exist_ok=True)
    return d


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bvh_builder.cpp")
        out = os.path.join(_build_dir(), "libray_tpu_native.so")
        try:
            if (not os.path.exists(out)
                    or os.path.getmtime(out) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     src, "-o", out],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(out)
            fn = lib.ray_tpu_build_bvh2
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # tri_lo
                ctypes.POINTER(ctypes.c_float),  # tri_hi
                ctypes.c_int,                    # n
                ctypes.c_int,                    # max_leaf
                ctypes.POINTER(ctypes.c_float),  # child_lo
                ctypes.POINTER(ctypes.c_float),  # child_hi
                ctypes.POINTER(ctypes.c_int32),  # child
                ctypes.POINTER(ctypes.c_int32),  # counts
                ctypes.POINTER(ctypes.c_int32),  # prim_indices
                ctypes.POINTER(ctypes.c_float),  # root_lo
                ctypes.POINTER(ctypes.c_float),  # root_hi
                ctypes.c_int,                    # capacity
                ctypes.c_int,                    # fat_leaves
            ]
            fs = lib.ray_tpu_build_sbvh
            fs.restype = ctypes.c_int
            fs.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # tri_lo
                ctypes.POINTER(ctypes.c_float),  # tri_hi
                ctypes.POINTER(ctypes.c_float),  # tri_verts (nullable)
                ctypes.c_int,                    # n
                ctypes.c_int,                    # max_leaf
                ctypes.c_int,                    # fat_leaves
                ctypes.POINTER(ctypes.c_float),  # child_lo
                ctypes.POINTER(ctypes.c_float),  # child_hi
                ctypes.POINTER(ctypes.c_int32),  # child
                ctypes.POINTER(ctypes.c_int32),  # counts
                ctypes.POINTER(ctypes.c_int32),  # prim_indices
                ctypes.POINTER(ctypes.c_float),  # root_lo
                ctypes.POINTER(ctypes.c_float),  # root_hi
                ctypes.c_int,                    # node_capacity
                ctypes.c_int,                    # ref_capacity
                ctypes.POINTER(ctypes.c_int32),  # out_n_refs
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


class NativeCapacityError(RuntimeError):
    """The C++ builder ran but its output capacity was exceeded (the
    builder returns -1); distinct from the library being unavailable so
    ``use_native='always'`` callers can report the real cause."""


def build_bvh2_native(tri_lo: np.ndarray, tri_hi: np.ndarray, max_leaf: int,
                      fat_leaves: bool = False):
    """Run the C++ builder; returns the same tuple layout the numpy builder
    packs into :class:`ray_tpu.scene.bvh.BVH2`, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    n = tri_lo.shape[0]
    cap = max(n, 2)
    tri_lo = np.ascontiguousarray(tri_lo, np.float32)
    tri_hi = np.ascontiguousarray(tri_hi, np.float32)
    child_lo = np.zeros((cap, 2, 3), np.float32)
    child_hi = np.zeros((cap, 2, 3), np.float32)
    child = np.zeros((cap, 2), np.int32)
    counts = np.zeros((cap, 2), np.int32)
    prim = np.zeros((n,), np.int32)
    root_lo = np.zeros(3, np.float32)
    root_hi = np.zeros(3, np.float32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    n_slots = lib.ray_tpu_build_bvh2(
        ptr(tri_lo, ctypes.c_float), ptr(tri_hi, ctypes.c_float),
        n, max_leaf,
        ptr(child_lo, ctypes.c_float), ptr(child_hi, ctypes.c_float),
        ptr(child, ctypes.c_int32), ptr(counts, ctypes.c_int32),
        ptr(prim, ctypes.c_int32),
        ptr(root_lo, ctypes.c_float), ptr(root_hi, ctypes.c_float),
        cap, int(bool(fat_leaves)),
    )
    if n_slots < 0:
        return None
    return (
        child_lo[:n_slots].copy(), child_hi[:n_slots].copy(),
        child[:n_slots].copy(), counts[:n_slots].copy(),
        prim, root_lo, root_hi,
    )


def build_sbvh_native(tri_lo: np.ndarray, tri_hi: np.ndarray,
                      tri_verts: np.ndarray | None, max_leaf: int,
                      fat_leaves: bool = False,
                      max_refs_factor: float = 1.75):
    """C++ SBVH with spatial reference splits (same split logic AND same
    ``fat_leaves`` default as numpy ``_build_sbvh``); returns the
    numpy-builder tuple layout (with duplicated prim_indices), None when
    the shared library is unavailable, or raises
    :class:`NativeCapacityError` when the ref/slot capacity overflows."""
    lib = _load()
    if lib is None:
        return None
    n = tri_lo.shape[0]
    ref_cap = int(n * max_refs_factor) + 64
    cap = max(ref_cap, 2)
    tri_lo = np.ascontiguousarray(tri_lo, np.float32)
    tri_hi = np.ascontiguousarray(tri_hi, np.float32)
    child_lo = np.zeros((cap, 2, 3), np.float32)
    child_hi = np.zeros((cap, 2, 3), np.float32)
    child = np.zeros((cap, 2), np.int32)
    counts = np.zeros((cap, 2), np.int32)
    prim = np.zeros((ref_cap,), np.int32)
    root_lo = np.zeros(3, np.float32)
    root_hi = np.zeros(3, np.float32)
    n_refs = np.zeros(1, np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    if tri_verts is not None:
        tri_verts = np.ascontiguousarray(
            tri_verts.reshape(n, 9), np.float32
        )
        vp = ptr(tri_verts, ctypes.c_float)
    else:
        vp = ctypes.POINTER(ctypes.c_float)()
    n_slots = lib.ray_tpu_build_sbvh(
        ptr(tri_lo, ctypes.c_float), ptr(tri_hi, ctypes.c_float), vp,
        n, max_leaf, int(bool(fat_leaves)),
        ptr(child_lo, ctypes.c_float), ptr(child_hi, ctypes.c_float),
        ptr(child, ctypes.c_int32), ptr(counts, ctypes.c_int32),
        ptr(prim, ctypes.c_int32),
        ptr(root_lo, ctypes.c_float), ptr(root_hi, ctypes.c_float),
        cap, ref_cap, ptr(n_refs, ctypes.c_int32),
    )
    if n_slots < 0:
        raise NativeCapacityError(
            f"native SBVH ref/slot capacity exceeded (n={n}, "
            f"ref_cap={ref_cap}); raise max_refs_factor"
        )
    return (
        child_lo[:n_slots].copy(), child_hi[:n_slots].copy(),
        child[:n_slots].copy(), counts[:n_slots].copy(),
        prim[:int(n_refs[0])].copy(), root_lo, root_hi,
    )
