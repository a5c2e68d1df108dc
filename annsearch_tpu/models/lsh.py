"""LSH index: SimHash tables with multi-probe and sorted-bucket lookup.

TPU-native rebuild of the reference ``LSHIndex`` (``src/cpu/lsh.rs``):
``num_tables`` tables of ``bits_per_hash`` orthogonalised Gaussian
hyperplanes (lsh.rs:135-145); euclidean mode hashes L2-normalised copies but
reranks on raw vectors (lsh.rs:148-168); multi-probe flips the
most-uncertain bits ranked by |projection| (lsh.rs:288-298); empty-bucket
queries fall back to random candidates (lsh.rs:302-307, reference warns when
>1% of queries fall back).

Hash-map buckets don't exist on TPU; each table keeps its codes **sorted**
and a query finds its bucket range with two batched ``searchsorted`` calls.
A bucket larger than the fixed ``max_bucket`` window is *stride-sampled*
(every ⌈len/cap⌉-th member) instead of truncated — uniform coverage of hot
buckets at bounded cost, the TPU analogue of the reference's scan-the-whole-
bucket behaviour. Candidates from all (table × probe) windows are unioned
and exactly reranked.

Probe sequences match the reference's ``generate_probes_ranked``
(lsh.rs:704-757): bits ranked by ascending |projection|, all Hamming
distance-1 flips first, then distance-2 pairs — the flip *patterns* over
rank positions are static, so the per-query work is one |proj| argsort plus
gathers.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rerank import rerank_exact
from ..utils.dist import Dist, normalise, sq_norms
from .base import BaseIndex, as_f32_matrix

__all__ = ["LSHIndex"]


def _probe_patterns(bits: int, n_probes: int) -> tuple[tuple[int, ...], ...]:
    """Static flip patterns over *rank* positions (0 = most uncertain bit):
    Hamming distance-1 in rank order, then distance-2 pairs — the reference's
    probe order (lsh.rs:704-757) with the per-query bit ranking factored out.
    """
    pats: list[tuple[int, ...]] = []
    for r in range(bits):
        if len(pats) >= n_probes - 1:
            return tuple(pats)
        pats.append((r,))
    for i in range(bits):
        for j in range(i + 1, bits):
            if len(pats) >= n_probes - 1:
                return tuple(pats)
            pats.append((i, j))
    return tuple(pats)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "n_probes", "cap", "k", "metric", "n"),
)
def _lsh_query_block(
    q: jax.Array,             # [bq, dim] raw queries (normalised if cosine)
    projections: jax.Array,   # [T, dim, bits]
    sorted_hashes: jax.Array, # [T, n]
    sorted_ids: jax.Array,    # [T, n]
    vectors: jax.Array,       # [n+1, dim] (sentinel row n)
    bits: int,
    n_probes: int,
    cap: int,
    k: int,
    metric: Dist,
    n: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One jitted program per query block: hash → ranked multi-probe bucket
    ranges → stride-sampled candidate union → exact rerank.

    Returns (dists [bq,k], ids [bq,k], had_candidates [bq] bool)."""
    bq = q.shape[0]
    num_tables = projections.shape[0]
    qn = q if metric == Dist.COSINE else normalise(q)
    powers = (2 ** jnp.arange(bits, dtype=jnp.int32))[None, :]
    lane = jnp.arange(cap, dtype=jnp.int32)[None, None, :]
    pats = _probe_patterns(bits, n_probes)

    all_ids = []
    for t in range(num_tables):
        proj = qn @ projections[t]                     # [bq, bits]
        base_h = jnp.sum((proj > 0).astype(jnp.int32) * powers, axis=-1)
        flip_order = jnp.argsort(jnp.abs(proj), axis=-1)  # asc — rank → bit
        probes = [base_h]
        for pat in pats:
            h = base_h
            for r in pat:
                h = h ^ (1 << flip_order[:, r]).astype(jnp.int32)
            probes.append(h)
        ph = jnp.stack(probes, axis=1)                 # [bq, P]
        pos = jnp.searchsorted(
            sorted_hashes[t], ph.reshape(-1), side="left"
        ).reshape(bq, -1).astype(jnp.int32)
        end = jnp.searchsorted(
            sorted_hashes[t], ph.reshape(-1), side="right"
        ).reshape(bq, -1).astype(jnp.int32)
        blen = end - pos                               # [bq, P]
        # stride-sample buckets wider than the window (distinct positions:
        # consecutive lanes advance by ≥1 when blen > cap)
        off = jnp.where(
            blen[:, :, None] <= cap,
            lane,
            (lane * blen[:, :, None]) // cap,
        )
        idx = jnp.minimum(pos[:, :, None] + off, n - 1)
        hit = lane < jnp.minimum(blen, cap)[:, :, None]
        ids = jnp.where(hit, jnp.take(sorted_ids[t], idx), n)
        all_ids.append(ids.reshape(bq, -1))
    cand = jnp.concatenate(all_ids, axis=-1)           # [bq, T·P·cap]

    had = jnp.any(cand < n, axis=-1)
    vecs = vectors[jnp.minimum(cand, n)]
    valid = cand < n
    d, i = rerank_exact(
        qn if metric == Dist.COSINE else q,
        vecs, jnp.minimum(cand, n - 1), valid, k, metric,
    )
    return d, i, had


class LSHIndex(BaseIndex):
    """Multi-probe SimHash."""

    _fallback_vectors = BaseIndex._fallback_from_vectors

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
        member_sizes = []
        for t in range(num_tables):
            bits = (hash_input @ self.projections[t]) > 0
            h = jnp.sum(bits.astype(jnp.int32) * powers, axis=-1)
            order = jnp.argsort(h)
            sorted_h.append(h[order])
            sorted_i.append(order.astype(jnp.int32))
            _, counts = np.unique(np.asarray(h), return_counts=True)
            # bucket size as seen by a random member (hot buckets dominate
            # the work a query actually needs)
            member_sizes.append(np.repeat(counts, counts))
        self.sorted_hashes = jnp.stack(sorted_h)      # [T, n]
        self.sorted_ids = jnp.stack(sorted_i)         # [T, n]
        # occupancy-aware window default: cover the median member's bucket
        # fully (hotter buckets are stride-sampled)
        ms = np.concatenate(member_sizes)
        self._bucket_q50 = int(np.quantile(ms, 0.5)) if len(ms) else 1
        self._seed = seed
        self.last_fallback_rate = 0.0
        if verbose:
            print(
                f"LSH built: T={num_tables} bits={bits_per_hash} "
                f"member-bucket q50={self._bucket_q50} "
                f"q95={int(np.quantile(ms, 0.95))} max={int(ms.max())}"
            )

    def query(
        self,
        query_mat: Any,
        k: int,
        n_probes: int = 4,
        max_bucket: int | None = None,
        query_block: int | None = None,
        exact_fallback: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        q = self._prep_queries(query_mat)
        if exact_fallback and self._exact_fallback_ok(q.shape[0]):
            return self._exact_query_small(q, self._clamp_k(k))
        k = self._clamp_k(k)
        if max_bucket is None:
            max_bucket = 1 << (
                max(self._bucket_q50, 2 * k, 32) - 1
            ).bit_length()
        max_bucket = min(max_bucket, self.n)
        if query_block is None:
            # bound the gathered candidate tile (~256 MB f32)
            width = self.num_tables * n_probes * max_bucket * self.dim
            query_block = min(1024, max(16, (64 << 20) // max(width, 1)))
        nq = q.shape[0]
        out_i, out_d = [], []
        fb_rows: list[int] = []
        for s in range(0, nq, query_block):
            qb = q[s : s + query_block]
            pad = query_block - qb.shape[0]
            if pad:
                qb = jnp.concatenate(
                    [qb, jnp.zeros((pad, self.dim), jnp.float32)]
                )
            d, i, had = _lsh_query_block(
                qb, self.projections, self.sorted_hashes, self.sorted_ids,
                self.vectors, self.bits, n_probes, max_bucket, k,
                self.metric, self.n,
            )
            take = qb.shape[0] - pad
            out_i.append(np.asarray(i)[:take])
            out_d.append(np.asarray(d)[:take])
            misses = np.nonzero(~np.asarray(had)[:take])[0]
            fb_rows.extend((s + misses).tolist())
        ids = np.concatenate(out_i)
        dists = np.concatenate(out_d)

        # empty-bucket fallback: exact rerank over random candidates
        # (lsh.rs:302-307; reference warns when >1% of queries fall back)
        self.last_fallback_rate = len(fb_rows) / max(nq, 1)
        if fb_rows:
            rows = np.asarray(fb_rows)
            rnd = jax.random.randint(
                jax.random.key(self._seed + 1), (len(rows), 1000), 0, self.n
            )
            vecs = self.vectors[rnd]
            d, i = rerank_exact(
                q[rows], vecs, rnd, jnp.ones(rnd.shape, bool), k, self.metric
            )
            ids[rows] = np.asarray(i)
            dists[rows] = np.asarray(d)
        if self.last_fallback_rate > 0.01:
            print(
                f"LSH warning: {self.last_fallback_rate:.1%} of queries hit "
                "empty buckets (random fallback) — consider fewer bits or "
                "more probes"
            )
        return ids, dists

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
                 1 if self.metric == Dist.COSINE else 0, self._bucket_q50]
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
            obj._bucket_q50 = int(meta[6]) if len(meta) > 6 else 32
            obj.last_fallback_rate = 0.0
        return obj
