"""IVF (inverted-file) index.

TPU-native rebuild of the reference's ``IvfIndex`` (``src/cpu/ivf.rs``) and
its GPU variant (``src/gpu/ivf_gpu.rs``). Same structure: k-means coarse
quantiser, vectors reordered cluster-contiguously
(``optimise_memory_layout``, ivf.rs:407-444), query = route to top-nprobe
centroids then scan those cells. The irregular parts are re-shaped for XLA:

  * the CSR cell layout becomes ``offsets/counts`` into the cluster-sorted
    vector array, with every probed cell padded to the max cell size and
    masked — static shapes instead of the reference GPU's variable-length
    task lists (ivf_gpu.rs:600-654);
  * routing is one ``[bq, nlist]`` distance matmul + ``top_k`` instead of
    per-query ``select_nth_unstable`` (k_means_utils.rs:56-108);
  * the per-cell scan is a scan over ``nprobe`` × cell tiles of gathered
    vectors with a batched distance einsum and a running top-k merge.

Defaults match the reference: ``nlist = √n`` (lib.rs docs), ``nprobe = √nlist``
(ivf.rs:261), k-means trained on ≤ min(256·nlist, 250k) rows (ivf.rs:158).
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import merge_topk, topk_smallest
from ..utils.dist import Dist, normalise, sq_norms
from .base import BaseIndex, as_f32_matrix
from .kmeans import assign_clusters, build_cells, train_centroids

__all__ = ["IvfIndex", "ivf_query_kernel"]

_INF = jnp.float32(jnp.inf)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "metric", "cell_cap", "cap_tile"),
)
def ivf_query_kernel(
    q: jax.Array,            # [bq, d] (normalised if cosine)
    vectors: jax.Array,      # [n_pad, d] cluster-sorted (padded with zeros)
    vec_sqnorms: jax.Array,  # [n_pad]
    centroids: jax.Array,    # [nlist, d]
    offsets: jax.Array,      # [nlist] int32 start of each cell in sorted order
    counts: jax.Array,       # [nlist] int32 cell sizes
    k: int,
    nprobe: int,
    metric: Dist,
    cell_cap: int,
    cap_tile: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Top-k over the ``nprobe`` nearest cells for a query block.

    Returns (dists [bq, k], idx [bq, k]) where idx are positions in the
    *sorted* vector array (callers remap through ``original_ids``).
    """
    bq = q.shape[0]
    n_pad = vectors.shape[0]

    # --- routing: distance to all centroids, top-nprobe ---------------------
    if metric == Dist.COSINE:
        cd = 1.0 - jax.lax.dot_general(
            q, centroids, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        cd = (
            sq_norms(q)[:, None]
            + sq_norms(centroids)[None, :]
            - 2.0
            * jax.lax.dot_general(
                q, centroids, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    _, probes = topk_smallest(cd, nprobe)  # [bq, nprobe]

    q_sq = sq_norms(q)
    n_tiles = -(-cell_cap // cap_tile)

    def probe_step(carry, p):
        best_d, best_i = carry
        c = probes[:, p]                       # [bq]
        start = offsets[c]                     # [bq]
        cnt = counts[c]                        # [bq]

        def tile_step(carry, t):
            best_d, best_i = carry
            lane = t * cap_tile + jax.lax.broadcasted_iota(
                jnp.int32, (bq, cap_tile), 1
            )                                   # [bq, cap_tile]
            idx = start[:, None] + lane
            valid = lane < cnt[:, None]
            idx_c = jnp.clip(idx, 0, n_pad - 1)
            vecs = vectors[idx_c]               # [bq, cap_tile, d] gather
            dots = jnp.einsum(
                "qd,qcd->qc", q, vecs, preferred_element_type=jnp.float32
            )
            if metric == Dist.COSINE:
                d = 1.0 - dots
            else:
                d = jnp.maximum(
                    q_sq[:, None] + vec_sqnorms[idx_c] - 2.0 * dots, 0.0
                )
            d = jnp.where(valid, d, _INF)
            return merge_topk(best_d, best_i, d, idx_c, k), None

        (best_d, best_i), _ = jax.lax.scan(
            tile_step, (best_d, best_i), jnp.arange(n_tiles)
        )
        return (best_d, best_i), None

    init = (
        jnp.full((bq, k), _INF, jnp.float32),
        jnp.zeros((bq, k), jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(probe_step, init, jnp.arange(nprobe))
    return best_d, best_i


class IvfIndex(BaseIndex):
    """Inverted-file index with k-means coarse quantiser."""

    _state_arrays = (
        "vectors",
        "sqnorms",
        "centroids",
        "offsets",
        "counts",
        "original_ids",
    )
    _state_scalars = ("n", "dim", "nlist", "cell_cap")

    def __init__(
        self,
        mat: Any,
        metric: str | Dist = "euclidean",
        nlist: int | None = None,
        max_iters: int = 30,
        seed: int = 42,
        verbose: bool = False,
    ):
        arr = as_f32_matrix(mat)
        n = arr.shape[0]
        if nlist is None:
            nlist = max(1, int(math.isqrt(n)))
        nlist = min(nlist, n)

        super().__init__(arr, metric)
        x = self.vectors  # normalised already if cosine

        self.nlist = nlist
        self.centroids = train_centroids(
            x, nlist, self.metric, max_iters=max_iters, seed=seed
        )
        assignments, _ = assign_clusters(x, self.centroids, self.metric)
        members, counts, order = build_cells(np.asarray(assignments), nlist)
        self.cell_cap = int(members.shape[1])

        # reorder storage cluster-contiguously; keep the inverse map
        order_j = jnp.asarray(order)
        self.vectors = x[order_j]
        self.sqnorms = (
            sq_norms(self.vectors) if self.metric == Dist.EUCLIDEAN else None
        )
        self.original_ids = order_j.astype(jnp.int32)
        self.counts = jnp.asarray(counts, dtype=jnp.int32)
        self.offsets = jnp.asarray(
            np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
        )
        if verbose:
            c = np.asarray(counts)
            print(
                f"IVF built: nlist={nlist} cell sizes min/median/max = "
                f"{c.min()}/{int(np.median(c))}/{c.max()}"
            )

    # -- queries ---------------------------------------------------------

    def default_nprobe(self) -> int:
        """Reference default: √nlist (ivf.rs:261)."""
        return max(1, int(math.isqrt(self.nlist)))

    def query(
        self,
        query_mat: Any,
        k: int,
        nprobe: int | None = None,
        query_block: int = 256,
        cap_tile: int = 1024,
    ) -> tuple[np.ndarray, np.ndarray]:
        q = self._prep_queries(query_mat)
        return self._query_prepped(q, k, nprobe, query_block, cap_tile)

    def _query_prepped(self, q, k, nprobe, query_block=256, cap_tile=1024):
        k = self._clamp_k(k)
        nprobe = self.default_nprobe() if nprobe is None else nprobe
        nprobe = max(1, min(nprobe, self.nlist))
        cap_tile = min(cap_tile, self.cell_cap)

        sqn = (
            self.sqnorms
            if self.sqnorms is not None
            else jnp.zeros((self.vectors.shape[0],), jnp.float32)
        )

        nq = q.shape[0]
        qb = min(query_block, max(nq, 8))
        pad = (-nq) % qb
        if pad:
            q = jnp.concatenate([q, jnp.zeros((pad, q.shape[1]), q.dtype)])
        blocks = q.reshape(-1, qb, q.shape[1])

        def run(block):
            return ivf_query_kernel(
                block,
                self.vectors,
                sqn,
                self.centroids,
                self.offsets,
                self.counts,
                k,
                nprobe,
                self.metric,
                self.cell_cap,
                cap_tile,
            )

        d, i = jax.lax.map(run, blocks)
        d = d.reshape(-1, k)[:nq]
        i = i.reshape(-1, k)[:nq]
        ids = jnp.take(self.original_ids, jnp.clip(i, 0, self.n - 1))
        return np.asarray(ids), np.asarray(d)

    def generate_knn(
        self, k: int, nprobe: int | None = None, **kw
    ) -> tuple[np.ndarray, np.ndarray]:
        """Self-query: stored vectors are already cluster-sorted, so query
        blocks are cluster-coherent (good gather locality). Results are
        re-scattered to original row order."""
        ids, d = self._query_prepped(self.vectors, k, nprobe, **kw)
        inv = np.empty(self.n, dtype=np.int64)
        inv[np.asarray(self.original_ids)] = np.arange(self.n)
        return ids[inv], d[inv]

    def vectors_original_order(self) -> np.ndarray:
        inv = np.empty(self.n, dtype=np.int64)
        inv[np.asarray(self.original_ids)] = np.arange(self.n)
        return np.asarray(self.vectors)[inv]

    def _post_load(self) -> None:
        self.nlist = int(self.nlist)
        self.cell_cap = int(self.cell_cap)
