"""faiss ``index_factory`` parity (the string-spec constructor users reach
for first; SURVEY.md §1b "index_factory" in the wrappers layer).

Supported specs (the subset meaningful for this engine):
  * ``"HNSW"``        -> HnswIndex with default M=32
  * ``"HNSW32"``      -> HnswIndex(M=32)
  * ``"HNSW16,Flat"`` -> same (flat f32 storage, faiss IndexHNSWFlat)
  * ``"HNSW32,SQ8"``  -> sq8 scalar-quantized storage (faiss IndexHNSWSQ
                          with ScalarQuantizer.QT_8bit): train() required
  * ``"HNSW32,PQ16"`` -> product-quantized storage, 16 sub-quantizers x
                          8 bits (faiss IndexHNSWPQ): train() required
  * ``"HNSW32,PQ32x4"`` -> 4-bit PQ, 32 sub-quantizers x 16 centroids
                          (faiss IndexHNSWPQ with PQ fast-scan geometry)
  * ``"Flat"``        -> FlatIndex (exact search)
  * ``"IDMap,..."``   -> IdMapIndex wrapping any of the above (faiss
                          IndexIDMap: user-chosen int64 ids, add_with_ids)
Metric: "l2" (faiss METRIC_L2) or "ip" (METRIC_INNER_PRODUCT).
"""

from __future__ import annotations

import re

from .config import L2
from .models.brute import FlatIndex
from .models.hnsw import HnswIndex


def index_factory(d: int, spec: str, metric: str = L2, **kw):
    parts = [p.strip() for p in spec.split(",") if p.strip()]
    if not parts:
        raise ValueError(f"empty index spec {spec!r}")
    if parts[0] == "IDMap":
        from .models.idmap import IdMapIndex
        if len(parts) == 1:
            raise ValueError(f"IDMap needs a wrapped spec, got {spec!r}")
        return IdMapIndex(index_factory(d, ",".join(parts[1:]), metric, **kw))
    head = parts[0]
    if head == "Flat":
        if len(parts) > 1:
            raise ValueError(f"unsupported spec {spec!r}")
        return FlatIndex(d, metric=metric)
    m = re.fullmatch(r"HNSW(\d+)?", head)
    if m:
        pq = re.fullmatch(r"PQ(\d+)(x4)?", parts[1]) \
            if len(parts) == 2 else None
        if len(parts) > 2 or (len(parts) == 2 and pq is None and
                              parts[1] not in ("Flat", "SQ8")):
            raise ValueError(
                f"unsupported spec {spec!r}: storage codecs are Flat "
                "(IndexHNSWFlat), SQ8 (IndexHNSWSQ/QT_8bit), PQ<m> "
                "(IndexHNSWPQ, 8 bits/sub-code) and PQ<m>x4 (4-bit)")
        M = int(m.group(1)) if m.group(1) else 32
        if len(parts) == 2 and parts[1] == "SQ8":
            kw.setdefault("dtype", "sq8")
        elif pq is not None:
            kw.setdefault("dtype", "pq")
            kw.setdefault("pq_m", int(pq.group(1)))
            if pq.group(2):
                kw.setdefault("pq_bits", 4)
        return HnswIndex(d, M, metric, **kw)
    raise ValueError(f"unsupported index spec {spec!r}")
