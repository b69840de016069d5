"""ctypes bindings for the native host-side graph builder (csrc/
graph_build.cpp): cell-list radius neighbor search (open + PBC) and
aggregation tile planning.  Auto-builds with g++ on first use; every entry
point has a pure-numpy fallback, so the native layer is an accelerator,
never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "_graph_build.so")


def _build() -> Optional[str]:
    src = os.path.join(os.path.dirname(__file__), "..", "csrc", "graph_build.cpp")
    src = os.path.abspath(src)
    out = _lib_path()
    if not os.path.exists(src):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", out],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except Exception:
        return None


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path) or (
        os.path.exists(path)
        and os.path.getmtime(path)
        < os.path.getmtime(
            os.path.join(os.path.dirname(__file__), "..", "csrc", "graph_build.cpp")
        )
    ):
        path = _build() or (path if os.path.exists(path) else None)
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.radius_graph_open.restype = ctypes.c_longlong
        lib.radius_graph_pbc.restype = ctypes.c_longlong
        lib.plan_segment_tiles.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def radius_graph_open_native(
    pos: np.ndarray, radius: float, max_neighbors: Optional[int]
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float32)
    n = pos.shape[0]
    mn = -1 if max_neighbors is None else int(max_neighbors)
    cap = max(n * (mn if mn > 0 else max(n - 1, 1)), 16)
    src = np.empty(cap, np.int64)
    dst = np.empty(cap, np.int64)
    cnt = lib.radius_graph_open(
        _ptr(pos, ctypes.c_float),
        ctypes.c_longlong(n),
        ctypes.c_float(radius),
        ctypes.c_longlong(mn),
        ctypes.c_longlong(cap),
        _ptr(src, ctypes.c_longlong),
        _ptr(dst, ctypes.c_longlong),
    )
    if cnt < 0:
        return None
    return np.stack([src[:cnt], dst[:cnt]])


def radius_graph_pbc_native(
    pos: np.ndarray,
    cell: np.ndarray,
    radius: float,
    max_neighbors: Optional[int],
    pbc=(True, True, True),
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float32)
    cell = np.ascontiguousarray(cell, np.float32)
    flags = np.asarray([1 if p else 0 for p in pbc], np.uint8)
    n = pos.shape[0]
    mn = -1 if max_neighbors is None else int(max_neighbors)
    cap = max(n * (mn if mn > 0 else 64) * 2, 64)
    for _ in range(4):
        src = np.empty(cap, np.int64)
        dst = np.empty(cap, np.int64)
        shift = np.empty((cap, 3), np.float32)
        cnt = lib.radius_graph_pbc(
            _ptr(pos, ctypes.c_float),
            ctypes.c_longlong(n),
            _ptr(cell, ctypes.c_float),
            _ptr(flags, ctypes.c_uint8),
            ctypes.c_float(radius),
            ctypes.c_longlong(mn),
            ctypes.c_longlong(cap),
            _ptr(src, ctypes.c_longlong),
            _ptr(dst, ctypes.c_longlong),
            _ptr(shift, ctypes.c_float),
        )
        if cnt >= 0:
            return np.stack([src[:cnt], dst[:cnt]]), shift[:cnt].copy()
        cap = int(-cnt) + 64
    return None


def plan_segment_tiles_native(
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    n_node: int,
    TN: int,
    TE: int,
    MB: int,
) -> Optional[dict]:
    lib = get_lib()
    if lib is None:
        return None
    rec = np.ascontiguousarray(receivers, np.int32)
    mask = np.ascontiguousarray(edge_mask, np.uint8)
    T = (n_node + TN - 1) // TN
    off = np.zeros((T, MB), np.int32)
    nb = np.zeros((T,), np.int32)
    sid = np.empty((T * MB, TE), np.int32)
    rc = lib.plan_segment_tiles(
        _ptr(rec, ctypes.c_int),
        _ptr(mask, ctypes.c_uint8),
        ctypes.c_longlong(rec.shape[0]),
        ctypes.c_longlong(n_node),
        ctypes.c_int(TN),
        ctypes.c_int(TE),
        ctypes.c_int(MB),
        _ptr(off, ctypes.c_int),
        _ptr(nb, ctypes.c_int),
        _ptr(sid, ctypes.c_int),
    )
    if rc != 0:
        raise AssertionError(f"tile needs more than {MB} blocks")
    return {
        "block_offsets": off,
        "blocks_per_tile": nb,
        "sid_blocks": sid,
        "max_blocks": MB,
        "tile_nodes": TN,
        "tile_edges": TE,
    }
