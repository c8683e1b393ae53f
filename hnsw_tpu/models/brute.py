"""``FlatIndex`` — exact search, the faiss ``IndexFlat`` capability (C16).

Used standalone (small N / ground-truth generation) and as the recall oracle
for the HNSW index. Same add/search surface as ``HnswIndex``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import L2
from ..ops.distances import brute_force_topk


class FlatIndex:
    def __init__(self, dim: int, metric: str = L2, dtype: str = "float32"):
        self.dim = dim
        self.metric = metric
        self.dtype = dtype
        self.is_trained = True
        self._chunks: list[np.ndarray] = []
        self._vectors = None
        self._sqnorms = None

    @property
    def ntotal(self) -> int:
        if self._vectors is not None:
            return self._vectors.shape[0]
        return sum(len(c) for c in self._chunks)

    def add(self, x: np.ndarray) -> None:
        x = np.ascontiguousarray(np.asarray(x, np.float32))
        if x.ndim != 2 or x.shape[1] != self.dim:
            raise ValueError(f"expected [n, {self.dim}], got {x.shape}")
        self._chunks.append(x)
        self._vectors = None

    def _materialize(self):
        if self._vectors is None:
            host = np.concatenate(self._chunks, axis=0) if self._chunks else \
                np.zeros((0, self.dim), np.float32)
            self._vectors = jnp.asarray(host, dtype=jnp.dtype(self.dtype))
            self._sqnorms = jnp.sum(self._vectors.astype(jnp.float32) ** 2, -1)
        return self._vectors

    def search(self, x: np.ndarray, k: int, tile_n: int = 65536):
        base = self._materialize()
        if base.shape[0] == 0:
            n = len(x)
            return (np.full((n, k), np.inf, np.float32),
                    np.full((n, k), -1, np.int64))
        d, i = brute_force_topk(jnp.asarray(np.asarray(x, np.float32)), base,
                                k=k, metric=self.metric, tile_n=tile_n,
                                base_sqnorms=self._sqnorms)
        return np.asarray(d), np.asarray(i, np.int64)

    def reconstruct(self, i: int) -> np.ndarray:
        return np.asarray(self._materialize()[i], np.float32)

    def range_search(self, x: np.ndarray, radius: float):
        """Exact range search, faiss ``IndexFlat.range_search`` semantics:
        L2 keeps squared distance < radius; IP keeps dot > radius. Returns
        (lims [nq+1], D, I) in faiss's CSR layout, per-query results sorted
        best-first."""
        x = np.asarray(x, np.float32)
        base = np.asarray(self._materialize(), np.float32)
        if self.metric == L2:
            d2 = ((x ** 2).sum(1)[:, None] + (base ** 2).sum(1)[None]
                  - 2.0 * x @ base.T)
            keep = d2 < radius
            score = d2
            order_sign = 1.0
        else:
            dots = x @ base.T
            keep = dots > radius
            score = dots
            order_sign = -1.0
        lims = np.zeros(len(x) + 1, np.int64)
        ds, is_ = [], []
        for qi in range(len(x)):
            rows = np.flatnonzero(keep[qi])
            rows = rows[np.argsort(order_sign * score[qi, rows],
                                   kind="stable")]
            lims[qi + 1] = lims[qi] + len(rows)
            ds.append(score[qi, rows])
            is_.append(rows)
        return (lims, np.concatenate(ds) if ds else np.zeros(0, np.float32),
                np.concatenate(is_).astype(np.int64) if is_
                else np.zeros(0, np.int64))
