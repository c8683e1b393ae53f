"""ctypes wrapper over the bundled C++ single-core HNSW baseline.

Builds ``libhnsw_cpu.so`` on first use via the Makefile (g++ only; no
pybind11 in this environment). Used by bench.py as the measured single-core
CPU denominator for vs_baseline and by tests as an extra recall oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhnsw_cpu.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) <
            os.path.getmtime(os.path.join(_DIR, "hnsw_cpu.cpp"))):
        subprocess.run(["make", "-s"], cwd=_DIR, check=True)
    lib = ctypes.CDLL(_SO)
    lib.hnsw_cpu_create.restype = ctypes.c_void_p
    lib.hnsw_cpu_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_uint64]
    lib.hnsw_cpu_free.argtypes = [ctypes.c_void_p]
    lib.hnsw_cpu_add.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int, ctypes.c_int]
    lib.hnsw_cpu_search.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_void_p, ctypes.c_void_p]
    lib.hnsw_cpu_ntotal.argtypes = [ctypes.c_void_p]
    lib.hnsw_cpu_ntotal.restype = ctypes.c_int
    _lib = lib
    return lib


class CpuHnsw:
    def __init__(self, dim: int, m: int = 16, metric: str = "l2",
                 seed: int = 42):
        self._lib = _load()
        self.dim = dim
        self._h = self._lib.hnsw_cpu_create(dim, m, 1 if metric == "ip" else 0,
                                            seed)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.hnsw_cpu_free(self._h)
            self._h = None

    @property
    def ntotal(self) -> int:
        return self._lib.hnsw_cpu_ntotal(self._h)

    def add(self, x: np.ndarray, ef_construction: int = 200) -> None:
        x = np.ascontiguousarray(x, np.float32)
        assert x.ndim == 2 and x.shape[1] == self.dim
        self._lib.hnsw_cpu_add(self._h, x.ctypes.data, len(x),
                               ef_construction)

    def search(self, q: np.ndarray, k: int, ef_search: int = 64,
               return_dists: bool = False):
        q = np.ascontiguousarray(q, np.float32)
        assert q.ndim == 2 and q.shape[1] == self.dim
        ids = np.empty((len(q), k), np.int32)
        d = np.empty((len(q), k), np.float32)
        self._lib.hnsw_cpu_search(self._h, q.ctypes.data, len(q), k,
                                  ef_search, ids.ctypes.data, d.ctypes.data)
        return (ids.astype(np.int64), d) if return_dists else \
            ids.astype(np.int64)
