"""IVF binary index: float-centroid routing + packed binary cells.

TPU-native rebuild of the reference ``IvfIndexBinary``
(``src/binary/ivf_binary.rs:22-927``): k-means on the float vectors routes
queries to cells, cells hold packed codes, and the three query tiers —
Hamming / asymmetric / exact-rerank — run on the cluster-major scan engine
(``ops/ivf_scan.py`` modes ``hamming`` / ``binary_asym``) followed by the
shared exact reranker.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.ivf_scan import build_probe_lists, ivf_cluster_scan
from ...ops.rerank import rerank_exact
from ...utils.dist import Dist, normalise
from ..base import BaseIndex, as_f32_matrix
from ..kmeans import assign_clusters, build_cells, train_centroids
from ..quantised.ivf import route_to_cells
from .binariser import Binariser
from .vec_store import DeviceVectorStore, MmapVectorStore

__all__ = ["IvfIndexBinary"]


class IvfIndexBinary(BaseIndex):
    """IVF routing over binarised cells."""

    _state_arrays = (
        "codes", "centroids", "offsets", "counts", "original_ids",
    )
    _state_scalars = ("n", "dim", "nlist", "cell_cap", "n_bits", "bin_mode")

    def __init__(
        self,
        mat: Any,
        metric: str = "euclidean",
        nlist: int | None = None,
        n_bits: int | None = None,
        binarisation: str = "simhash",
        max_iters: int = 30,
        seed: int = 42,
        store: str | bool = True,
        verbose: bool = False,
    ):
        arr = as_f32_matrix(mat)
        n = arr.shape[0]
        if nlist is None:
            nlist = max(1, int(math.isqrt(n)))
        nlist = min(nlist, n)

        super().__init__(arr, metric)
        x = self.vectors

        self.nlist = nlist
        self.centroids = train_centroids(
            x, nlist, self.metric, max_iters=max_iters, seed=seed
        )
        assignments, _ = assign_clusters(x, self.centroids, self.metric)
        members, counts, order = build_cells(np.asarray(assignments), nlist)
        self.cell_cap = int(members.shape[1])

        order_j = jnp.asarray(order)
        x_sorted = x[order_j]
        self.original_ids = order_j.astype(jnp.int32)
        self.counts = jnp.asarray(counts, dtype=jnp.int32)
        self.offsets = jnp.asarray(
            np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
        )

        self.binariser = Binariser.train(x_sorted, n_bits, binarisation, seed)
        self.n_bits = self.binariser.n_bits
        self.bin_mode = self.binariser.mode
        codes = self.binariser.encode(x_sorted)
        self.codes = jnp.concatenate(
            [codes, jnp.zeros((self.cell_cap, codes.shape[1]), codes.dtype)]
        )

        if store is True:
            self.store = DeviceVectorStore(x_sorted)
        elif isinstance(store, str):
            self.store = MmapVectorStore.write(store, np.asarray(x_sorted))
        else:
            self.store = None
        self.vectors = None

    def default_nprobe(self) -> int:
        return max(1, int(math.isqrt(self.nlist)))

    def query(
        self,
        query_mat: Any,
        k: int,
        nprobe: int | None = None,
        rerank: str | None = None,
        rerank_factor: int = 20,
    ) -> tuple[np.ndarray, np.ndarray]:
        q = self._prep_q(query_mat)
        k = self._clamp_k(k)
        nprobe = self.default_nprobe() if nprobe is None else nprobe
        nprobe = max(1, min(nprobe, self.nlist))
        if rerank == "exact" and self.store is None:
            raise ValueError("exact rerank requires a vector store")
        nq = q.shape[0]

        probes = route_to_cells(q, self.centroids, nprobe, self.metric)
        cluster_ids, lists = build_probe_lists(np.asarray(probes), self.nlist, nq)

        k_scan = k if rerank != "exact" else min(
            max(k, k * rerank_factor), self.n
        )
        if rerank == "asymmetric":
            q_eff = self.binariser.project(q)
            pad = (-q_eff.shape[1]) % 32
            if pad:
                q_eff = jnp.concatenate(
                    [q_eff, jnp.zeros((nq, pad), q_eff.dtype)], axis=1
                )
            mode = "binary_asym"
        else:
            q_eff = self.binariser.encode(q)
            mode = "hamming"

        zeros_sn = jnp.zeros((self.codes.shape[0],), jnp.float32)
        best_d, best_i = ivf_cluster_scan(
            q_eff,
            jnp.asarray(cluster_ids),
            jnp.asarray(lists),
            self.codes,
            zeros_sn,
            self.offsets,
            self.counts,
            self.centroids,
            k_scan,
            self.metric,
            self.cell_cap,
            mode,
        )
        d = np.asarray(best_d)[:nq]
        i = np.asarray(best_i)[:nq]

        if rerank == "exact":
            valid = np.isfinite(d)
            i = np.clip(i, 0, self.n - 1)
            block = 1024
            ids_out, d_out = [], []
            for s in range(0, nq, block):
                cb = jnp.asarray(i[s : s + block])
                vecs = self.store.gather(i[s : s + block])
                dd, ii = rerank_exact(
                    q[s : s + block], vecs, cb, jnp.asarray(valid[s : s + block]),
                    k, self.metric,
                )
                ids_out.append(np.asarray(ii))
                d_out.append(np.asarray(dd))
            i = np.concatenate(ids_out)
            d = np.concatenate(d_out)

        ids = np.asarray(self.original_ids)[np.clip(i, 0, self.n - 1)]
        return ids, d

    def generate_knn(self, k: int, nprobe: int | None = None, **kw):
        if isinstance(self.store, DeviceVectorStore):
            q = self.vectors_original_order()
            return self.query(q, k, nprobe=nprobe, **kw)
        raise ValueError("self-query requires a device vector store")

    def _prep_q(self, query_mat):
        q = as_f32_matrix(query_mat)
        if q.shape[1] != self.dim:
            raise ValueError(f"query dim {q.shape[1]} != index dim {self.dim}")
        qj = jnp.asarray(q)
        return normalise(qj) if self.metric == Dist.COSINE else qj

    def memory_usage_bytes(self) -> int:
        total = (
            int(self.codes.size) * 4
            + int(self.centroids.size) * 4
            + int(self.counts.size + self.offsets.size + self.original_ids.size) * 4
            + self.binariser.memory_usage_bytes()
        )
        if self.store is not None:
            total += self.store.memory_usage_bytes()
        return total

    def vectors_original_order(self) -> np.ndarray:
        if not isinstance(self.store, DeviceVectorStore):
            raise ValueError("no device vector store")
        inv = np.empty(self.n, dtype=np.int64)
        inv[np.asarray(self.original_ids)] = np.arange(self.n)
        return np.asarray(self.store.vectors)[inv]
