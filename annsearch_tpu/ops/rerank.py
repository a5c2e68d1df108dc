"""Exact reranking of gathered candidates.

Two-stage search support (reference: exhaustive_binary.rs:374-424 /
ivf_binary.rs exact-rerank tier): a cheap scan proposes ``k·rerank_factor``
candidates, their full-precision vectors are gathered from a vector store,
and one batched distance einsum re-scores them exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.dist import Dist, sq_norms

__all__ = ["rerank_exact", "rerank_from_store"]

_INF = jnp.float32(jnp.inf)


def _dedup_by_id(ids: jax.Array, d: jax.Array) -> jax.Array:
    """inf-out duplicate candidate ids per row (multi-tree / multi-probe
    unions overlap; without this, top-k could return the same id twice)."""
    order = jnp.argsort(ids, axis=-1)
    s = jnp.take_along_axis(ids, order, axis=-1)
    dup_s = jnp.concatenate(
        [jnp.zeros(s.shape[:-1] + (1,), bool), s[..., 1:] == s[..., :-1]],
        axis=-1,
    )
    inv = jnp.argsort(order, axis=-1)
    dup = jnp.take_along_axis(dup_s, inv, axis=-1)
    return jnp.where(dup, _INF, d)


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def rerank_exact(
    q: jax.Array,          # [nq, d] (normalised if cosine)
    cand_vecs: jax.Array,  # [nq, kc, d] gathered full-precision candidates
    cand_ids: jax.Array,   # [nq, kc] int32
    valid: jax.Array,      # [nq, kc] bool
    k: int,
    metric: Dist,
) -> tuple[jax.Array, jax.Array]:
    """Exact distances to candidates, top-k ascending → (dists, ids)."""
    # HIGHEST: "exact rerank" must actually be exact — TPU DEFAULT lowers
    # f32 einsums to one bf16 pass, whose ~2⁻⁹-relative dot error scrambles
    # fine orderings (measured: RaBitQ rf10 recall 0.9977 on CPU vs 0.7411
    # on TPU with an identical candidate pipeline, and rf20 < rf10)
    dots = jnp.einsum(
        "qd,qcd->qc", q, cand_vecs, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == Dist.COSINE:
        vn = jnp.sqrt(jnp.maximum(jnp.sum(cand_vecs * cand_vecs, -1), 1e-30))
        d = 1.0 - dots / vn
    else:
        d = jnp.maximum(
            sq_norms(q)[:, None] + jnp.sum(cand_vecs * cand_vecs, -1) - 2.0 * dots,
            0.0,
        )
    d = jnp.where(valid, d, _INF)
    d = _dedup_by_id(cand_ids, d)
    nd, pos = jax.lax.top_k(-d, min(k, d.shape[1]))
    return -nd, jnp.take_along_axis(cand_ids, pos, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "metric", "qb"))
def rerank_from_store(
    q: jax.Array,        # [nq, d] (normalised if cosine)
    cand_d: jax.Array,   # [nq, kc] scan distances (inf = invalid slot)
    cand_i: jax.Array,   # [nq, kc] int32 row positions into ``store``
    store: jax.Array,    # [n(+pad), d] f32 device-resident vectors
    k: int,
    metric: Dist,
    qb: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Device-resident exact rerank: gather candidate rows from ``store``
    and re-score, blocked over queries inside ONE compiled program.

    The host-orchestrated equivalent (read back [nq, kc] candidates, then
    re-dispatch gather+rerank per block) pays a multi-MB link round-trip
    plus ~2 dispatches per block; through a tunnelled host that dominated
    the whole query (reference rerank tier: exhaustive_binary.rs:374-424
    runs in-process and never pays this). Returns (dists [nq,k], ids [nq,k]).
    """
    nq, kc = cand_i.shape
    qb = min(qb, max(nq, 8))
    pad = (-nq) % qb
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, q.shape[1]), q.dtype)])
        cand_d = jnp.concatenate(
            [cand_d, jnp.full((pad, kc), _INF, cand_d.dtype)]
        )
        cand_i = jnp.concatenate(
            [cand_i, jnp.zeros((pad, kc), cand_i.dtype)]
        )

    def blk(args):
        qq, dd, ii = args
        iic = jnp.clip(ii, 0, store.shape[0] - 1)
        vecs = store[iic]  # [qb, kc, d] stays in HBM — never crosses the link
        return rerank_exact(qq, vecs, iic, jnp.isfinite(dd), k, metric)

    d, i = jax.lax.map(
        blk,
        (
            q.reshape(-1, qb, q.shape[1]),
            cand_d.reshape(-1, qb, kc),
            cand_i.reshape(-1, qb, kc),
        ),
    )
    return d.reshape(-1, k)[:nq], i.reshape(-1, k)[:nq]
