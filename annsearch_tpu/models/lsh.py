"""LSH index: SimHash tables with multi-probe and sorted-bucket lookup.

TPU-native rebuild of the reference ``LSHIndex`` (``src/cpu/lsh.rs``):
``num_tables`` tables of ``bits_per_hash`` orthogonalised Gaussian
hyperplanes (lsh.rs:135-145); euclidean mode hashes L2-normalised copies but
reranks on raw vectors (lsh.rs:148-168); multi-probe flips the
most-uncertain bits ranked by |projection| (lsh.rs:288-298); empty-bucket
queries fall back to random candidates (lsh.rs:302-307, reference warns when
>1% of queries fall back).

Hash-map buckets don't exist on TPU; each table keeps its codes **sorted**
and a query finds its bucket with a batched ``searchsorted``, reading a
fixed ``max_bucket`` window masked by hash equality. Candidates from all
(table × probe) windows are unioned and exactly reranked.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rerank import rerank_exact
from ..utils.dist import Dist, normalise, sq_norms
from .base import BaseIndex, as_f32_matrix

__all__ = ["LSHIndex"]


class LSHIndex(BaseIndex):
    """Multi-probe SimHash."""

    def __init__(
        self,
        mat: Any,
        metric: str = "euclidean",
        num_tables: int = 8,
        bits_per_hash: int = 16,
        seed: int = 42,
        verbose: bool = False,
    ):
        if bits_per_hash > 30:
            raise ValueError("bits_per_hash must be ≤ 30 (int32 hash space)")
        super().__init__(mat, metric)
        vecs = jnp.concatenate(
            [self.vectors, jnp.zeros((1, self.dim), jnp.float32)]
        )
        self.vectors = vecs
        self.sqnorms = sq_norms(vecs)
        self.num_tables = num_tables
        self.bits = bits_per_hash

        # hashes computed on L2-normalised copies for euclidean
        # (lsh.rs:148-168); cosine vectors are already normalised
        hash_input = (
            vecs[: self.n]
            if self.metric == Dist.COSINE
            else normalise(vecs[: self.n])
        )

        key = jax.random.key(seed)
        projs = []
        for t in range(num_tables):
            kt = jax.random.fold_in(key, t)
            g = jax.random.normal(kt, (self.dim, bits_per_hash), jnp.float32)
            q, _ = jnp.linalg.qr(g)  # orthogonalised hyperplanes
            projs.append(q[:, :bits_per_hash])
        self.projections = jnp.stack(projs)           # [T, d, b]

        powers = (2 ** jnp.arange(bits_per_hash, dtype=jnp.int32))[None, :]
        sorted_h, sorted_i = [], []
        for t in range(num_tables):
            bits = (hash_input @ self.projections[t]) > 0
            h = jnp.sum(bits.astype(jnp.int32) * powers, axis=-1)
            order = jnp.argsort(h)
            sorted_h.append(h[order])
            sorted_i.append(order.astype(jnp.int32))
        self.sorted_hashes = jnp.stack(sorted_h)      # [T, n]
        self.sorted_ids = jnp.stack(sorted_i)         # [T, n]
        self._seed = seed
        self.last_fallback_rate = 0.0

    def query(
        self,
        query_mat: Any,
        k: int,
        n_probes: int = 4,
        max_bucket: int | None = None,
        query_block: int = 256,
    ) -> tuple[np.ndarray, np.ndarray]:
        q = self._prep_queries(query_mat)
        k = self._clamp_k(k)
        max_bucket = (
            max_bucket
            if max_bucket is not None
            else max(32, int(2 * self.n / (2**self.bits)) + k)
        )
        nq = q.shape[0]
        out_i, out_d = [], []
        fallbacks = 0
        for s in range(0, nq, query_block):
            qb = q[s : s + query_block]
            cand, n_fb = self._candidates(qb, n_probes, max_bucket)
            fallbacks += n_fb
            vecs = self.vectors[jnp.minimum(cand, self.n)]
            valid = cand < self.n
            d, i = rerank_exact(
                qb, vecs, jnp.minimum(cand, self.n - 1), valid, k, self.metric
            )
            out_i.append(np.asarray(i))
            out_d.append(np.asarray(d))
        self.last_fallback_rate = fallbacks / max(nq, 1)
        if self.last_fallback_rate > 0.01:
            print(
                f"LSH warning: {self.last_fallback_rate:.1%} of queries hit "
                "empty buckets (random fallback) — consider fewer bits or "
                "more probes"
            )
        return np.concatenate(out_i), np.concatenate(out_d)

    def _candidates(self, q: jax.Array, n_probes: int, cap: int):
        bq = q.shape[0]
        qn = q if self.metric == Dist.COSINE else normalise(q)
        powers = (2 ** jnp.arange(self.bits, dtype=jnp.int32))[None, :]
        lane = jnp.arange(cap, dtype=jnp.int32)[None, None, :]
        all_cands = []
        for t in range(self.num_tables):
            proj = qn @ self.projections[t]            # [bq, bits]
            base_h = jnp.sum((proj > 0).astype(jnp.int32) * powers, axis=-1)
            # multi-probe: flip the most-uncertain bits (smallest |proj|)
            flip_order = jnp.argsort(jnp.abs(proj), axis=-1)  # asc
            probes = [base_h]
            for p in range(1, n_probes):
                bit = flip_order[:, (p - 1) % self.bits]
                probes.append(base_h ^ (1 << bit).astype(jnp.int32))
            ph = jnp.stack(probes, axis=1)             # [bq, P]
            pos = jnp.searchsorted(self.sorted_hashes[t], ph.reshape(-1))
            pos = pos.reshape(bq, n_probes)
            idx = jnp.minimum(pos[:, :, None] + lane, self.n - 1)
            hit = (
                jnp.take(self.sorted_hashes[t], idx) == ph[:, :, None]
            )
            ids = jnp.where(
                hit, jnp.take(self.sorted_ids[t], idx), self.n
            )
            all_cands.append(ids.reshape(bq, -1))
        cand = jnp.concatenate(all_cands, axis=-1)     # [bq, T·P·cap]

        # empty-bucket fallback: random candidates (lsh.rs:302-307)
        n_valid = jnp.sum(cand < self.n, axis=-1)
        need_fb = n_valid == 0
        n_fb = int(jnp.sum(need_fb))
        if n_fb:
            rnd = jax.random.randint(
                jax.random.key(self._seed + 1), cand.shape, 0,
                self.n,
            )
            cand = jnp.where(need_fb[:, None], rnd, cand)
        return cand, n_fb

    def generate_knn(self, k: int, **kw):
        return self.query(np.asarray(self.vectors[: self.n]), k, **kw)

    def vectors_original_order(self) -> np.ndarray:
        return np.asarray(self.vectors[: self.n])

    def _prep_queries(self, query_mat):
        q = as_f32_matrix(query_mat)
        if q.shape[1] != self.dim:
            raise ValueError(f"query dim {q.shape[1]} != index dim {self.dim}")
        qj = jnp.asarray(q)
        return normalise(qj) if self.metric == Dist.COSINE else qj

    def memory_usage_bytes(self) -> int:
        return (
            int(self.vectors.size + self.sqnorms.size) * 4
            + int(self.projections.size) * 4
            + int(self.sorted_hashes.size + self.sorted_ids.size) * 4
        )

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> None:
        np.savez(
            path,
            vectors=np.asarray(self.vectors),
            projections=np.asarray(self.projections),
            sorted_hashes=np.asarray(self.sorted_hashes),
            sorted_ids=np.asarray(self.sorted_ids),
            meta=np.array(
                [self.n, self.dim, self.num_tables, self.bits, self._seed,
                 1 if self.metric == Dist.COSINE else 0]
            ),
        )

    @classmethod
    def load(cls, path: str) -> "LSHIndex":
        import jax.numpy as _jnp

        with np.load(path if path.endswith(".npz") else path + ".npz") as z:
            meta = z["meta"]
            obj = cls.__new__(cls)
            obj.n, obj.dim, obj.num_tables, obj.bits, obj._seed = (
                int(meta[0]), int(meta[1]), int(meta[2]), int(meta[3]),
                int(meta[4]),
            )
            obj.metric = Dist.COSINE if meta[5] == 1 else Dist.EUCLIDEAN
            obj.vectors = _jnp.asarray(z["vectors"])
            obj.sqnorms = sq_norms(obj.vectors)
            obj.projections = _jnp.asarray(z["projections"])
            obj.sorted_hashes = _jnp.asarray(z["sorted_hashes"])
            obj.sorted_ids = _jnp.asarray(z["sorted_ids"])
            obj.last_fallback_rate = 0.0
        return obj
