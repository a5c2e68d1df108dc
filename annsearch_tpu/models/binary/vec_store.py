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

import ctypes
import json
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MmapVectorStore", "DeviceVectorStore"]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(__file__)))),
    "native",
)
_native_lib = None


def _load_native():
    """Load (building if needed) the C++ gather library; None on failure —
    callers fall back to numpy memmap."""
    global _native_lib
    if _native_lib is not None:
        return _native_lib
    so = os.path.join(_NATIVE_DIR, "libvecstore.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.vecstore_open.restype = ctypes.c_void_p
        lib.vecstore_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.vecstore_close.argtypes = [ctypes.c_void_p]
        lib.vecstore_gather.restype = ctypes.c_int
        lib.vecstore_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _native_lib = lib
        return lib
    except OSError:
        return None


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
    """Raw-file vector store: ``<path>.vec`` (f32 rows) + ``<path>.json``.

    Gathers go through the native C++ library (``native/vec_store.cc`` —
    mmap + MADV_RANDOM + multithreaded row copies, the reference
    vec_store.rs:16-204 runtime equivalent) when available, else a numpy
    memmap fallback.
    """

    def __init__(self, path: str, mmap: np.memmap, n: int, dim: int):
        self.path = path
        self._mm = mmap
        self.n = n
        self.dim = dim
        self._lib = _load_native()
        self._handle = None
        if self._lib is not None:
            h = self._lib.vecstore_open(
                (path + ".vec").encode(), n, dim
            )
            self._handle = h if h else None

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
        flat = np.ascontiguousarray(np.asarray(ids).reshape(-1), np.int64)
        if self._handle is not None:
            out = np.empty((flat.size, self.dim), np.float32)
            rc = self._lib.vecstore_gather(
                self._handle,
                flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                flat.size,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                0,
            )
            if rc == 0:
                return jnp.asarray(out.reshape(ids.shape + (self.dim,)))
        rows = np.asarray(self._mm[flat])
        return jnp.asarray(rows.reshape(ids.shape + (self.dim,)))

    def __del__(self):  # release the native mapping
        try:
            if getattr(self, "_handle", None) is not None:
                self._lib.vecstore_close(self._handle)
        except Exception:
            pass

    def memory_usage_bytes(self) -> int:
        # on-disk, not RAM/HBM — reported as 0 like an mmap'd file's resident
        # accounting; file size available via stat
        return 0

    def file_size_bytes(self) -> int:
        return os.path.getsize(self.path + ".vec")
