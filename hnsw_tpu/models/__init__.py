"""Index model classes (faiss Index* parity)."""
from .brute import FlatIndex
from .hnsw import HnswIndex

__all__ = ["FlatIndex", "HnswIndex"]
