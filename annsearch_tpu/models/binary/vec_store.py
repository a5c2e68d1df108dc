"""On-disk vector store for exact reranking.

Equivalent of the reference's ``MmapVectorStore``
(``src/binary/vec_store.rs:16-204`` — raw native-endian vectors+norms files,
mmap'd with random-access advice, used to rerank binary candidates). Here the
store is a pair of raw little-endian files (vectors f32, norms f32) accessed
through ``numpy.memmap``; gathers pull only the candidate rows into host
memory before shipping them to the device for the rerank matmul.

A device-resident variant (``DeviceVectorStore``) keeps the f32 vectors in
HBM — the right call when they fit; the mmap store covers the
bigger-than-HBM case the reference built it for.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MmapVectorStore", "DeviceVectorStore"]


class DeviceVectorStore:
    """f32 vectors resident in device HBM; gather on device."""

    def __init__(self, vectors: jax.Array):
        self.vectors = jnp.asarray(vectors, dtype=jnp.float32)
        self.n, self.dim = self.vectors.shape

    def gather(self, ids: np.ndarray) -> jax.Array:
        """ids [nq, kc] → [nq, kc, dim] on device."""
        return self.vectors[jnp.asarray(ids)]

    def memory_usage_bytes(self) -> int:
        return int(self.vectors.size) * 4


class MmapVectorStore:
    """Raw-file vector store: ``<path>.vec`` (f32 rows) + ``<path>.json``."""

    def __init__(self, path: str, mmap: np.memmap, n: int, dim: int):
        self.path = path
        self._mm = mmap
        self.n = n
        self.dim = dim

    @classmethod
    def write(cls, path: str, vectors: np.ndarray) -> "MmapVectorStore":
        arr = np.ascontiguousarray(np.asarray(vectors, dtype=np.float32))
        n, dim = arr.shape
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        arr.tofile(path + ".vec")
        with open(path + ".json", "w") as f:
            json.dump({"n": n, "dim": dim, "dtype": "float32"}, f)
        return cls.open(path)

    @classmethod
    def open(cls, path: str) -> "MmapVectorStore":
        with open(path + ".json") as f:
            meta = json.load(f)
        mm = np.memmap(
            path + ".vec", dtype=np.float32, mode="r",
            shape=(meta["n"], meta["dim"]),
        )
        return cls(path, mm, meta["n"], meta["dim"])

    def gather(self, ids: np.ndarray) -> jax.Array:
        """ids [nq, kc] → [nq, kc, dim] on device (host gather from mmap)."""
        rows = np.asarray(self._mm[np.asarray(ids).reshape(-1)])
        return jnp.asarray(rows.reshape(ids.shape + (self.dim,)))

    def memory_usage_bytes(self) -> int:
        # on-disk, not RAM/HBM — reported as 0 like an mmap'd file's resident
        # accounting; file size available via stat
        return 0

    def file_size_bytes(self) -> int:
        return os.path.getsize(self.path + ".vec")
