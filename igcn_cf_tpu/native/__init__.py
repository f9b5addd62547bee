"""ctypes bindings for the native (C++) data-path kernels.

Builds ``libigcn_native.so`` on demand via make (g++ is in the image;
pybind11 is not, so the ABI is plain C + ctypes). Every entry point has a
pure-numpy fallback so the framework works without a toolchain; the native
path is the default when the build succeeds.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libigcn_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            os.path.join(_DIR, "kcore.cpp")
        ):
            subprocess.run(
                ["make", "-s", "-C", _DIR], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_SO)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.kcore_filter.restype = ctypes.c_int64
        lib.kcore_filter.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, u8p, i64p, i64p,
        ]
        lib.dedup_earliest.restype = ctypes.c_int64
        lib.dedup_earliest.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64, i64p, i64p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _p(a: np.ndarray, typ):
    return a.ctypes.data_as(typ)


def kcore_filter(
    users: np.ndarray, items: np.ndarray, n_users: int, n_items: int,
    min_inter: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Iterative bipartite k-core peel (reference dataset.py:66-92 semantics:
    surviving nodes get dense ids in first-appearance order over the edge
    list). Returns (keep_mask bool (E,), user_map (n_users,), item_map
    (n_items,)) with -1 for dropped nodes."""
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    n_edges = len(users)
    lib = _load()
    if lib is not None:
        keep = np.zeros(n_edges, dtype=np.uint8)
        user_map = np.empty(n_users, dtype=np.int64)
        item_map = np.empty(n_items, dtype=np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.kcore_filter(
            _p(users, i64p), _p(items, i64p), n_edges, n_users, n_items,
            min_inter, _p(keep, u8p), _p(user_map, i64p), _p(item_map, i64p),
        )
        return keep.astype(bool), user_map, item_map
    return _kcore_numpy(users, items, n_users, n_items, min_inter)


def _kcore_numpy(users, items, n_users, n_items, min_inter):
    """Vectorized fallback: round-based peeling."""
    alive = np.ones(len(users), dtype=bool)
    while True:
        deg_u = np.bincount(users[alive], minlength=n_users)
        deg_i = np.bincount(items[alive], minlength=n_items)
        bad = (deg_u[users] < min_inter) | (deg_i[items] < min_inter)
        bad &= alive
        if not bad.any():
            break
        alive &= ~bad
    user_map = np.full(n_users, -1, dtype=np.int64)
    item_map = np.full(n_items, -1, dtype=np.int64)
    ku = users[alive]
    ki = items[alive]
    # first-appearance dense ids
    seen_u = np.unique(ku, return_index=True)
    order = np.argsort(seen_u[1])
    user_map[seen_u[0][order]] = np.arange(len(seen_u[0]))
    seen_i = np.unique(ki, return_index=True)
    order = np.argsort(seen_i[1])
    item_map[seen_i[0][order]] = np.arange(len(seen_i[0]))
    return alive, user_map, item_map


def dedup_earliest(
    users: np.ndarray, items: np.ndarray, times: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Deduplicate (user, item) records keeping the earliest timestamp and
    first-appearance order (reference dataset.py:28-37). Returns (indices of
    surviving records, their min-timestamps)."""
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    times = np.ascontiguousarray(times, dtype=np.int64)
    n = len(users)
    lib = _load()
    if lib is not None:
        order = np.empty(n, dtype=np.int64)
        t_out = np.empty(n, dtype=np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        kept = lib.dedup_earliest(
            _p(users, i64p), _p(items, i64p), _p(times, i64p), n,
            _p(order, i64p), _p(t_out, i64p),
        )
        return order[:kept], t_out[:kept]
    # numpy fallback
    key = users * (items.max() + 1 if n else 1) + items
    first = {}
    tmin = {}
    for e in range(n):
        k = key[e]
        if k in first:
            tmin[k] = min(tmin[k], times[e])
        else:
            first[k] = e
            tmin[k] = times[e]
    idx = np.array(sorted(first.values()), dtype=np.int64)
    t = np.array([tmin[key[e]] for e in idx], dtype=np.int64)
    return idx, t
