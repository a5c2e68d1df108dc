"""IVF quantised indexes: bf16 / SQ8 / PQ (residual) / OPQ (residual+rotation).

TPU-native rebuild of the reference's quantised IVF family
(``src/quantised/ivf_bf16.rs`` / ``ivf_sq8.rs`` / ``ivf_pq.rs`` /
``ivf_opq.rs``): float-centroid routing, cluster-contiguous compressed
storage, cell scans in the quantised domain. The cell scans run on the
cluster-major engine (``ops/ivf_scan.py``) — each cell is decoded once per
batch and scored for all its probing queries with one dense matmul, replacing
the reference's per-query LUT/ADC loops (ivf_pq.rs:315-372) and integer SIMD
scans (ivf_sq8.rs:291-328).

Residual encoding for PQ/OPQ matches the reference (ivf_pq.rs:195-274):
codebooks are trained on ``vec − centroid``; OPQ additionally learns an
orthogonal rotation on the residuals (ivf_opq.rs) — at query time everything
is evaluated in the rotated space, which is distance-preserving.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.ivf_scan import build_probe_lists, ivf_cluster_scan
from ...ops.topk import topk_smallest
from ...utils.dist import Dist, normalise, sq_norms
from ..base import BaseIndex, as_f32_matrix
from ..kmeans import assign_clusters, build_cells, train_centroids
from .quantisers import (
    OptimisedProductQuantiser,
    ProductQuantiser,
    ScalarQuantiser,
)

__all__ = ["IvfIndexBf16", "IvfSq8Index", "IvfPqIndex", "IvfOpqIndex"]


@functools.partial(jax.jit, static_argnames=("nprobe", "metric"))
def route_to_cells(
    q: jax.Array, centroids: jax.Array, nprobe: int, metric: Dist
) -> jax.Array:
    """Top-nprobe nearest centroids per query (one [nq, nlist] matmul +
    top_k; replaces per-query select_nth, k_means_utils.rs:56-108)."""
    dots = jax.lax.dot_general(
        q, centroids, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if metric == Dist.COSINE:
        d = 1.0 - dots
    else:
        d = sq_norms(q)[:, None] + sq_norms(centroids)[None, :] - 2.0 * dots
    _, probes = topk_smallest(d, nprobe)
    return probes


class _IvfQuantisedBase(BaseIndex):
    """Shared IVF-quantised scaffolding: coarse quantiser, sorted cells,
    routing, cluster-major scan, id remap."""

    mode = "f32"

    def __init__(
        self,
        mat: Any,
        metric: str | Dist = "euclidean",
        nlist: int | None = None,
        max_iters: int = 30,
        seed: int = 42,
        verbose: bool = False,
        **encode_kwargs,
    ):
        arr = as_f32_matrix(mat)
        n = arr.shape[0]
        if nlist is None:
            nlist = max(1, int(math.isqrt(n)))
        nlist = min(nlist, n)

        super().__init__(arr, metric)
        x = self.vectors  # normalised if cosine

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
        self.vectors = None  # replaced by quantised storage
        self._encode_storage(x_sorted, seed=seed, **encode_kwargs)

    # subclass hooks ------------------------------------------------------

    def _encode_storage(self, x_sorted: jax.Array, seed: int, **kw) -> None:
        raise NotImplementedError

    def _encode_queries(self, q: jax.Array) -> jax.Array:
        return q

    def _scan_centroids(self) -> jax.Array:
        return self.centroids

    def _codebooks(self):
        return None

    def _pad_storage(self, storage: jax.Array, sqnorms: jax.Array):
        """Pad with cell_cap trailing rows so static cell slices stay in
        bounds, then store."""
        pad = self.cell_cap
        self.storage = jnp.concatenate(
            [storage, jnp.zeros((pad,) + storage.shape[1:], storage.dtype)]
        )
        self.store_sqnorms = jnp.concatenate(
            [sqnorms, jnp.zeros((pad,), sqnorms.dtype)]
        )

    # query ----------------------------------------------------------------

    def default_nprobe(self) -> int:
        return max(1, int(math.isqrt(self.nlist)))

    def query(
        self, query_mat: Any, k: int, nprobe: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        q = self._prep_queries(query_mat)
        return self._query_prepped(q, k, nprobe)

    def _prep_queries(self, query_mat):
        q = as_f32_matrix(query_mat)
        if q.shape[1] != self.dim:
            raise ValueError(f"query dim {q.shape[1]} != index dim {self.dim}")
        qj = jnp.asarray(q)
        return normalise(qj) if self.metric == Dist.COSINE else qj

    def _query_prepped(self, q, k, nprobe):
        k = self._clamp_k(k)
        nprobe = self.default_nprobe() if nprobe is None else nprobe
        nprobe = max(1, min(nprobe, self.nlist))
        nq = q.shape[0]

        probes = route_to_cells(q, self.centroids, nprobe, self.metric)
        cluster_ids, lists = build_probe_lists(
            np.asarray(probes), self.nlist, nq
        )
        best_d, best_i = ivf_cluster_scan(
            self._encode_queries(q),
            jnp.asarray(cluster_ids),
            jnp.asarray(lists),
            self.storage,
            self.store_sqnorms,
            self.offsets,
            self.counts,
            self._scan_centroids(),
            k,
            self.metric,
            self.cell_cap,
            self.mode,
            codebooks=self._codebooks(),
        )
        d = np.asarray(best_d)[:nq]
        i = np.asarray(best_i)[:nq]
        ids = np.asarray(self.original_ids)[np.clip(i, 0, self.n - 1)]
        return ids, d

    def generate_knn(
        self, k: int, nprobe: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        q = jnp.asarray(self.vectors_original_order())
        if self.metric == Dist.COSINE:
            q = normalise(q)
        return self._query_prepped(q, k, nprobe)

    def _decoded_sorted(self) -> np.ndarray:
        raise NotImplementedError

    def vectors_original_order(self) -> np.ndarray:
        inv = np.empty(self.n, dtype=np.int64)
        inv[np.asarray(self.original_ids)] = np.arange(self.n)
        return self._decoded_sorted()[inv]


class IvfIndexBf16(_IvfQuantisedBase):
    """IVF routing (f32 centroids) + bf16 cells (reference ivf_bf16.rs)."""

    mode = "bf16"
    _state_arrays = (
        "storage", "store_sqnorms", "centroids", "offsets", "counts",
        "original_ids",
    )
    _state_scalars = ("n", "dim", "nlist", "cell_cap")

    def _encode_storage(self, x_sorted, seed):
        s16 = x_sorted.astype(jnp.bfloat16)
        self._pad_storage(s16, sq_norms(s16.astype(jnp.float32)))

    def _decoded_sorted(self) -> np.ndarray:
        return np.asarray(
            self.storage[: self.n].astype(jnp.float32)
        )

    def _post_load(self):
        self.nlist = int(self.nlist)
        self.cell_cap = int(self.cell_cap)
        self.storage = self.storage.astype(jnp.bfloat16)


class IvfSq8Index(_IvfQuantisedBase):
    """IVF routing + global-SQ8 int8 cells, integer-space distances
    (reference ivf_sq8.rs: cosine pre-normalises data+centroids :159-197,
    quantised i32 norms :241-248)."""

    mode = "sq8"
    _state_arrays = (
        "storage", "store_sqnorms", "scales", "centroids", "offsets",
        "counts", "original_ids",
    )
    _state_scalars = ("n", "dim", "nlist", "cell_cap")

    def _encode_storage(self, x_sorted, seed):
        self.quantiser = ScalarQuantiser.train(x_sorted)
        self.scales = self.quantiser.scales
        codes = self.quantiser.encode(x_sorted)
        c32 = codes.astype(jnp.int32)
        self._pad_storage(codes, jnp.sum(c32 * c32, axis=-1))

    def _encode_queries(self, q):
        return self.quantiser.encode(q)

    def _decoded_sorted(self) -> np.ndarray:
        return np.asarray(self.quantiser.decode(self.storage[: self.n]))

    def _post_load(self):
        self.nlist = int(self.nlist)
        self.cell_cap = int(self.cell_cap)
        self.quantiser = ScalarQuantiser(self.scales)


class IvfPqIndex(_IvfQuantisedBase):
    """IVF + residual PQ (reference ivf_pq.rs:23-531): codebooks trained on
    ``vec − centroid``, ADC-equivalent residual scoring per probed cell."""

    mode = "pq_residual"
    _state_arrays = (
        "storage", "store_sqnorms", "codebooks", "centroids", "offsets",
        "counts", "original_ids",
    )
    _state_scalars = ("n", "dim", "nlist", "cell_cap", "m")

    def __init__(self, mat, metric="euclidean", nlist=None, m: int = 16, **kw):
        super().__init__(mat, metric, nlist=nlist, m=m, **kw)

    def _encode_storage(self, x_sorted, seed, m: int = 16):
        self.m = m
        # residuals relative to the owning centroid (cluster-sorted order)
        owner = jnp.repeat(
            jnp.arange(self.nlist), np.asarray(self.counts), total_repeat_length=self.n
        )
        residuals = x_sorted - self.centroids[owner]
        self.quantiser = ProductQuantiser.train(residuals, m, seed=seed)
        self.codebooks = self.quantiser.codebooks
        codes = self.quantiser.encode(residuals)
        self._pad_storage(codes, self._recon_sqnorms(codes, owner))

    def _recon_sqnorms(self, codes, owner):
        """euclidean: ‖dec_res‖² (the residual-distance identity term);
        cosine: ‖centroid + dec_res‖² (to renormalise the reconstruction)."""
        if self.metric == Dist.COSINE:
            recon = self.quantiser.decode(codes) + self.centroids[owner]
            return sq_norms(recon)
        return self.quantiser.code_sqnorms(codes)

    def _codebooks(self):
        return self.codebooks

    def _decoded_sorted(self) -> np.ndarray:
        dec = np.asarray(self.quantiser.decode(self.storage[: self.n]))
        owner = np.repeat(np.arange(self.nlist), np.asarray(self.counts))
        return dec + np.asarray(self.centroids)[owner]

    def _post_load(self):
        self.nlist = int(self.nlist)
        self.cell_cap = int(self.cell_cap)
        self.m = int(self.m)
        self.quantiser = ProductQuantiser(self.codebooks, self.m, self.dim)


class IvfOpqIndex(IvfPqIndex):
    """IVF + residual OPQ (reference ivf_opq.rs): an orthogonal rotation is
    learned on the residuals; cells store PQ codes of rotated residuals and
    queries/centroids are rotated at scan time (distance-preserving)."""

    mode = "pq_residual"
    _state_arrays = IvfPqIndex._state_arrays + ("rotation",)

    def _encode_storage(self, x_sorted, seed, m: int = 16):
        self.m = m
        owner = jnp.repeat(
            jnp.arange(self.nlist), np.asarray(self.counts), total_repeat_length=self.n
        )
        residuals = x_sorted - self.centroids[owner]
        opq = OptimisedProductQuantiser.train(residuals, m, seed=seed)
        self.opq = opq
        self.rotation = opq.rotation
        self.codebooks = opq.pq.codebooks
        self.quantiser = opq.pq
        codes = opq.encode(residuals)
        if self.metric == Dist.COSINE:
            # norms in rotated space equal norms in original space
            recon = opq.pq.decode(codes) + self.centroids[owner] @ self.rotation
            sn = sq_norms(recon)
        else:
            sn = opq.pq.code_sqnorms(codes)
        self._pad_storage(codes, sn)

    def _encode_queries(self, q):
        return q @ self.rotation

    def _scan_centroids(self):
        return self.centroids @ self.rotation

    def _decoded_sorted(self) -> np.ndarray:
        dec = np.asarray(self.opq.decode(self.storage[: self.n]))
        owner = np.repeat(np.arange(self.nlist), np.asarray(self.counts))
        return dec + np.asarray(self.centroids)[owner]

    def _query_prepped(self, q, k, nprobe):
        # routing in the original space; scoring in the rotated space
        return super()._query_prepped(q, k, nprobe)

    def _post_load(self):
        super()._post_load()
        self.opq = OptimisedProductQuantiser(self.quantiser, self.rotation)
