"""Native runtime: C++ union-find kernels with build-on-demand + fallback.

The shared library is compiled from ``native.cpp`` with g++ on first use and
cached next to the source.  When a toolchain isn't available the pure-Python
fallbacks (scipy connected components, numpy-side union find) keep everything
working — the native path is a host-side performance feature, not a
correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native.cpp")
_SO = os.path.join(_HERE, "_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.xmtpu_connected_components.restype = ctypes.c_int64
            lib.xmtpu_connected_components.argtypes = [
                i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p]
            lib.xmtpu_establish_tracks.restype = ctypes.c_int64
            lib.xmtpu_establish_tracks.argtypes = [
                i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def have_native() -> bool:
    return _load() is not None


def connected_component_labels(u, v, n_nodes: int):
    """Component label per node for the graph with edges (u[i], v[i]).

    Returns ``(n_components, labels)``; native union-find when available,
    scipy fallback otherwise.
    """
    u = np.ascontiguousarray(u, dtype=np.int64)
    v = np.ascontiguousarray(v, dtype=np.int64)
    lib = _load()
    if lib is not None:
        labels = np.empty(n_nodes, dtype=np.int64)
        n_comp = lib.xmtpu_connected_components(u, v, len(u), n_nodes, labels)
        return int(n_comp), labels
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    g = coo_matrix((np.ones(len(u)), (u, v)), shape=(n_nodes, n_nodes))
    n_comp, labels = connected_components(g + g.T, directed=False)
    return int(n_comp), labels.astype(np.int64)


def establish_tracks(node_a, node_b, n_nodes: int):
    """Merge pairwise matches into tracks (GLOMAP track establishment core,
    deps/glomap/glomap/controllers/track_establishment.cc).

    ``node_a``/``node_b`` are pre-compacted observation node ids in
    [0, n_nodes).  Returns ``(n_tracks, track_of_node)`` with track ids
    ordered by descending track size.
    """
    a = np.ascontiguousarray(node_a, dtype=np.int64)
    b = np.ascontiguousarray(node_b, dtype=np.int64)
    lib = _load()
    if lib is not None:
        track_of = np.empty(n_nodes, dtype=np.int64)
        n_tracks = lib.xmtpu_establish_tracks(a, b, len(a), n_nodes, track_of)
        return int(n_tracks), track_of
    # fallback: components == tracks, then size-sort
    n_comp, labels = connected_component_labels(a, b, n_nodes)
    sizes = np.bincount(labels, minlength=n_comp)
    order = np.argsort(-sizes, kind="stable")
    remap = np.empty_like(order)
    remap[order] = np.arange(n_comp)
    return int(n_comp), remap[labels]
