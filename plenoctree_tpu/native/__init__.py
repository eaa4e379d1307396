"""ctypes bindings for the native host runtime (native/cc/*.cc).

The shared library is built lazily with g++ on first use and cached next to
the sources; every entry point has a pure-numpy fallback so the framework
works without a toolchain (`PLENOCTREE_NO_NATIVE=1` forces the fallback).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "cc", "plenoctree_native.cc"
)
_OUT = os.path.join(os.path.dirname(__file__), "_plenoctree_native.so")


def _build():
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        _OUT,
        os.path.abspath(_SRC),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("PLENOCTREE_NO_NATIVE"):
            return None
        try:
            src_mtime = os.path.getmtime(os.path.abspath(_SRC))
            if not os.path.exists(_OUT) or os.path.getmtime(_OUT) < src_mtime:
                _build()
            lib = ctypes.CDLL(_OUT)
        except Exception:
            return None
        lib.pn_build_octree.restype = ctypes.c_int64
        lib.pn_build_octree.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.pn_median_cut.restype = ctypes.c_int64
        lib.pn_median_cut.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.pn_query_points.restype = None
        lib.pn_query_points.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        _LIB = lib
        return _LIB


def build_octree_native(coords, depth):
    """Bottom-up octree build from occupied voxel coords at reso 2^(depth+1).

    Returns (child [n, 2, 2, 2] int32 rel-offsets, parent_depth [n, 2]) or
    None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.int32)
    n = coords.shape[0]
    capacity = max(16, min(2 * n + 16, 8 * n + 16))
    while True:
        child = np.zeros((capacity, 8), np.int32)
        parent_depth = np.zeros((capacity, 2), np.int32)
        rc = lib.pn_build_octree(
            coords.ctypes.data,
            n,
            depth,
            child.ctypes.data,
            parent_depth.ctypes.data,
            capacity,
        )
        if rc == -1:
            capacity *= 2
            continue
        if rc < 0:
            return None
        n_nodes = int(rc)
        return (
            child[:n_nodes].reshape(n_nodes, 2, 2, 2),
            parent_depth[:n_nodes],
        )


def median_cut_native(colors, weights=None, bits=16):
    """Native median cut; returns (palette, ids) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    colors = np.ascontiguousarray(colors, dtype=np.float32)
    m, c = colors.shape
    if m == 0:
        return np.zeros((0, c), np.float32), np.zeros((0,), np.uint32)
    levels = min(bits, max(int(np.ceil(np.log2(max(m, 2)))), 1))
    max_palette = 1 << levels
    ids = np.zeros(m, np.uint32)
    palette = np.zeros((max_palette, c), np.float32)
    wptr = 0
    warr = None
    if weights is not None and len(weights):
        warr = np.ascontiguousarray(weights, dtype=np.float32)
        wptr = warr.ctypes.data
    p = lib.pn_median_cut(
        colors.ctypes.data, wptr, m, c, levels, ids.ctypes.data,
        palette.ctypes.data, max_palette,
    )
    if p < 0:
        return None
    return palette[: int(p)].copy(), ids


def query_points_native(child_rel, points_tree, max_depth):
    """Native descent; returns (flat_cell int64 [p], depth int32 [p]) or None."""
    lib = get_lib()
    if lib is None:
        return None
    child = np.ascontiguousarray(child_rel.reshape(child_rel.shape[0], 8), np.int32)
    pts = np.ascontiguousarray(points_tree, np.float32)
    p = pts.shape[0]
    out_cell = np.zeros(p, np.int64)
    out_depth = np.zeros(p, np.int32)
    lib.pn_query_points(
        child.ctypes.data,
        child.shape[0],
        pts.ctypes.data,
        p,
        max_depth,
        out_cell.ctypes.data,
        out_depth.ctypes.data,
    )
    return out_cell, out_depth
