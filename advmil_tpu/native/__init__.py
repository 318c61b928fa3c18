"""ctypes bindings for the native C++ kNN/KMeans kernels, with lazy
compilation (g++ is in the image; no pybind11 needed) and numpy fallbacks.

Used by the offline graph/cluster tools in place of the reference's nmslib
HNSW + sklearn Cython (SURVEY.md §2.9). High-dimensional feature kNN is done
on the accelerator instead (ops in advmil_tpu.tools.build_graphs) — the MXU
beats any CPU kNN at d=1024.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "knn_kmeans.cc")
_LIB_PATH = osp.join(_HERE, "libadvmil_native.so")
_lib = None


def _build_lib() -> str:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not osp.exists(_LIB_PATH) or (osp.getmtime(_SRC) > osp.getmtime(_LIB_PATH)):
            _build_lib()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.advmil_knn_l2.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
        lib.advmil_kmeans.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception as exc:
        print(f"[native] build/load failed ({exc}); using numpy fallbacks")
        _lib = False
    return _lib or None


def knn_l2(X: np.ndarray, k: int, n_threads: int = 0) -> np.ndarray:
    """Exact L2 kNN indices [n, k], self included at column 0 (zero distance).

    Deterministic replacement for the reference's approximate nmslib HNSW
    query (reference tools/patchgcn_graph_s2.py:60-64)."""
    X = np.ascontiguousarray(X, np.float32)
    n, d = X.shape
    k = min(k, n)
    lib = get_lib()
    if lib is not None:
        out = np.empty((n, k), np.int32)
        lib.advmil_knn_l2(
            X.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d, k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.cast(None, ctypes.POINTER(ctypes.c_float)), n_threads)
        return out
    # numpy fallback (blocked)
    out = np.empty((n, k), np.int32)
    norms = (X ** 2).sum(1)
    blk = max(1, int(2e7) // max(n, 1))
    for s in range(0, n, blk):
        e = min(n, s + blk)
        d2 = norms[s:e, None] + norms[None, :] - 2.0 * (X[s:e] @ X.T)
        part = np.argpartition(d2, k - 1, axis=1)[:, :k]
        row_d = np.take_along_axis(d2, part, axis=1)
        order = np.argsort(row_d, axis=1)
        out[s:e] = np.take_along_axis(part, order, axis=1)
    return out


def kmeans(X: np.ndarray, k: int, max_iter: int = 300, seed: int = 42):
    """KMeans labels [n] + centroids [k, d] (Lloyd, kmeans++ init)."""
    X = np.ascontiguousarray(X, np.float32)
    n, d = X.shape
    lib = get_lib()
    labels = np.empty((n,), np.int32)
    centroids = np.empty((k, d), np.float32)
    if lib is not None:
        lib.advmil_kmeans(
            X.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d, k,
            max_iter, seed,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            centroids.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return labels, centroids
    from sklearn.cluster import KMeans
    km = KMeans(n_clusters=k, random_state=seed, max_iter=max_iter).fit(X)
    return km.labels_.astype(np.int32), km.cluster_centers_.astype(np.float32)
