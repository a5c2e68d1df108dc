"""Cluster-major IVF scan engine.

The reference GPU IVF pipeline builds a host-side task list
(query, cluster-range, write offset) and launches one mega-kernel over it
(``src/gpu/ivf_gpu.rs:575-697``). The TPU reformulation keeps the host-built
probe lists but inverts the loop to make every step a *dense* matmul:

  scan over active clusters c:
    cell   = storage[offsets[c] : offsets[c]+cap]          (one DMA, shared)
    dec    = decode(cell)                                  (variant-specific)
    qg     = queries[probe_lists[c]]                       ([maxq, d] gather)
    dists  = distance(qg, dec)                             ([maxq, cap] MXU)
    best[probe_lists[c]] = merge_topk(best[...], dists)    (scatter-merge)

Each cell is read/decoded ONCE per query batch regardless of how many
queries probe it, and the scoring matmul is [maxq, d] × [d, cap] — dense MXU
work. Query ids within a step are unique except the sentinel padding slot
(row nq, discarded by callers), so the scatter is race-free for real rows.

Supports storage variants: f32, bf16, int8 (SQ8 integer-space), PQ codes
(+ residual PQ for IVF-PQ/OPQ).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dist import Dist, sq_norms
from .binary import unpack_pm1
from .quantised import pq_decode_tile
from .topk import merge_topk

__all__ = ["ivf_cluster_scan", "build_probe_lists", "build_probe_lists_from_pairs"]

_INF = jnp.float32(jnp.inf)


def _next_pow2(v: int) -> int:
    return 1 << (max(v, 1) - 1).bit_length()


def build_probe_lists(
    probes: np.ndarray, nlist: int, nq: int
) -> tuple[np.ndarray, np.ndarray]:
    """Invert [nq, nprobe] probe assignments into per-cluster query lists.

    Returns ``(cluster_ids [ncl], lists [ncl, maxq])`` covering only clusters
    probed by ≥1 query; ``lists`` is padded with ``nq`` (sentinel row of the
    scatter target), ``cluster_ids`` is padded to a power of two with
    ``nlist`` (sentinel cluster with zero count). Host-side — the analogue of
    the reference's CPU task-list construction (ivf_gpu.rs:600-635). Both
    dims are rounded up to powers of two to bound recompilation.
    """
    probes = np.asarray(probes)
    flat_c = probes.reshape(-1)
    flat_q = np.repeat(
        np.arange(probes.shape[0], dtype=np.int32), probes.shape[1]
    )
    return build_probe_lists_from_pairs(flat_q, flat_c, nlist, nq)


def build_probe_lists_from_pairs(
    flat_q: np.ndarray,
    flat_c: np.ndarray,
    nlist: int,
    nq: int,
    maxq_cap: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Build per-cluster padded query lists from explicit (query, cluster)
    task pairs. Fully vectorised host work (the self-kNN path pushes
    nq·nprobe into the millions — no python loops).

    Skewed probe distributions make the padded width ``maxq`` balloon (a
    popular cluster sets the pad for every row). ``maxq_cap`` chunks a
    popular cluster's query list across several scan rows (the same cell is
    scanned once per chunk), bounding padding waste; defaults to
    4× the mean row occupancy.
    """
    flat_q = np.asarray(flat_q, dtype=np.int32)
    flat_c = np.asarray(flat_c, dtype=np.int64)
    order = np.argsort(flat_c, kind="stable")
    counts = np.bincount(flat_c, minlength=nlist)
    active = np.nonzero(counts)[0]
    if len(active) == 0:
        return (
            np.full(1, nlist, np.int32),
            np.full((1, 1), nq, np.int32),
        )
    acounts = counts[active]
    if maxq_cap is None:
        mean = max(1, int(acounts.mean()))
        maxq_cap = _next_pow2(4 * mean)
    maxq = min(_next_pow2(int(acounts.max())), _next_pow2(maxq_cap))

    # rows per active cluster after chunking
    nchunks = -(-acounts // maxq)
    total_rows = int(nchunks.sum())
    ncl = _next_pow2(total_rows)

    cluster_ids = np.full(ncl, nlist, dtype=np.int32)
    cluster_ids[:total_rows] = np.repeat(active, nchunks).astype(np.int32)
    lists = np.full((ncl, maxq), nq, dtype=np.int32)

    qs = flat_q[order]
    # rank of each task within its cluster
    starts = np.concatenate([[0], np.cumsum(acounts)[:-1]])
    ranks = np.arange(len(qs)) - np.repeat(starts, acounts)
    # row = cluster's first row + rank // maxq; col = rank % maxq
    row_base = np.concatenate([[0], np.cumsum(nchunks)[:-1]])
    rows = np.repeat(row_base, acounts) + ranks // maxq
    lists[rows, ranks % maxq] = qs
    return cluster_ids, lists


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "cap", "mode", "k_cell", "precision", "approx"),
)
def ivf_cluster_scan(
    queries: jax.Array,      # [nq, d] effective queries (f32, or int8 for sq8)
    cluster_ids: jax.Array,  # [ncl] int32 active clusters (pad = nlist)
    probe_lists: jax.Array,  # [ncl, maxq] int32 query ids (pad = nq)
    storage: jax.Array,      # [n_pad, d] (f32/bf16/int8) or [n_pad, m] u8 codes
    sqnorms: jax.Array,      # [n_pad] f32|i32 — ‖row‖² in the scoring space
    offsets: jax.Array,      # [nlist] int32 into the sorted storage
    counts: jax.Array,       # [nlist] int32 cell sizes
    centroids: jax.Array,    # [nlist, d] f32 (residual shift / cosine dot)
    k: int,
    metric: Dist,
    cap: int,
    mode: str,               # "f32" | "bf16" | "sq8" | "pq" | "pq_residual"
    codebooks: jax.Array | None = None,  # [m, 256, ds] for pq modes
    k_cell: int | None = None,
    aux: jax.Array | None = None,        # [n_pad] extra per-row data (rabitq: dot_corr)
    approx: bool = False,                 # approx_min_k per-cell selection
    precision=None,                       # scoring matmul precision; defaults
                                          # per mode: HIGHEST for f32 (exact
                                          # parity), HIGH for pq (input
                                          # rounding to bf16 is measurable at
                                          # high dim), irrelevant for int/±1
) -> tuple[jax.Array, jax.Array]:
    """Returns (best_d, best_i) of shape [nq+1, k] — callers drop the last
    (sentinel) row. ``best_i`` are positions in the sorted storage.

    ``storage``/``sqnorms`` must be padded with ≥ ``cap`` trailing rows so the
    last cell's static slice stays in bounds.
    """
    nq = queries.shape[0]
    nlist = offsets.shape[0]
    k_cell = k if k_cell is None else k_cell
    # PQ scoring in plain bf16: measured recall identical to 3-pass HIGH on
    # the 1M×128d suite (the plateau is quantisation, not rounding); f32
    # mode keeps HIGHEST for exactness parity (kMkNN, full-probe IVF)
    prec_pq = jax.lax.Precision.DEFAULT if precision is None else precision
    prec_f32 = jax.lax.Precision.HIGHEST if precision is None else precision

    if mode in ("hamming", "binary_asym", "rabitq"):
        q_sq = jnp.zeros((nq,), jnp.float32)
    elif mode == "sq8":
        q_sq = jnp.sum(
            queries.astype(jnp.int32) * queries.astype(jnp.int32), axis=-1
        ).astype(jnp.float32)
    else:
        q_sq = sq_norms(queries)
    # sentinel row for padded query slots
    queries_x = jnp.concatenate(
        [queries, jnp.zeros((1, queries.shape[1]), queries.dtype)]
    )
    q_sq = jnp.concatenate([q_sq, jnp.zeros((1,), jnp.float32)])
    # sentinel cluster (count 0) for padded cluster slots
    offsets_x = jnp.concatenate([offsets, jnp.zeros((1,), offsets.dtype)])
    counts_x = jnp.concatenate([counts, jnp.zeros((1,), counts.dtype)])
    centroids_x = jnp.concatenate(
        [centroids, jnp.zeros((1, centroids.shape[1]), centroids.dtype)]
    )

    def step(carry, row):
        best_d, best_i = carry
        c = cluster_ids[row]
        qid = probe_lists[row]                  # [maxq]
        qg = queries_x[qid]                     # [maxq, d]
        start = offsets_x[c]
        cell = jax.lax.dynamic_slice_in_dim(storage, start, cap, 0)
        sn = jax.lax.dynamic_slice_in_dim(sqnorms, start, cap, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
        valid = lane < counts_x[c]

        if mode in ("pq", "pq_residual"):
            dec = pq_decode_tile(cell, codebooks)         # [cap, d] f32
            sn_f = sn.astype(jnp.float32)
            dots_fn = lambda lhs: jax.lax.dot_general(
                lhs,
                dec,
                (((1,), (1,)), ((), ())),
                precision=prec_pq,
                preferred_element_type=jnp.float32,
            )
            if mode == "pq_residual":
                if metric == Dist.COSINE:
                    # x̂ = centroid + dec_res, not unit: d = 1 − q·x̂/‖x̂‖
                    # (sn holds ‖x̂‖² — stored per metric at build time)
                    num = dots_fn(qg) + (qg @ centroids_x[c])[:, None]
                    d = 1.0 - num / jnp.sqrt(jnp.maximum(sn_f, 1e-12))[None, :]
                else:
                    qr = qg - centroids_x[c][None, :]     # residual query
                    qr_sq = jnp.sum(qr * qr, axis=-1)
                    d = jnp.maximum(
                        qr_sq[:, None] + sn_f[None, :] - 2.0 * dots_fn(qr),
                        0.0,
                    )
            else:
                dots = dots_fn(qg)
                if metric == Dist.COSINE:
                    d = 1.0 - dots / jnp.sqrt(jnp.maximum(sn_f, 1e-12))[None, :]
                else:
                    d = jnp.maximum(
                        q_sq[qid][:, None] + sn_f[None, :] - 2.0 * dots, 0.0
                    )
        elif mode == "rabitq":
            # RaBitQ unbiased estimator (reference dist_binary.rs:466-588,
            # rabitq.rs:97-207). queries/centroids arrive pre-rotated and
            # zero-padded to w·32 lanes; storage = packed sign bits of the
            # rotated unit residual; sn = ‖x−c‖ (dist_to_centroid);
            # aux = ‖rotated unit residual‖₁ (dot correction).
            # TPU deviation: ⟨qru, sign⟩ is computed exactly via a ±1 matmul
            # instead of the reference's int4-quantised SIMD dot — same
            # estimator, strictly less quantisation error, rides the MXU.
            nbits = storage.shape[1] * 32
            rqr = qg - centroids_x[c][None, :]           # rotated residual
            q_dist = jnp.sqrt(jnp.sum(rqr * rqr, axis=-1))
            qru = rqr / jnp.maximum(q_dist, 1e-12)[:, None]
            x_pm = unpack_pm1(cell, nbits)               # pad lanes: qru=0
            inner = jax.lax.dot_general(
                qru.astype(jnp.bfloat16), x_pm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            corr = jax.lax.dynamic_slice_in_dim(aux, start, cap, 0)
            q_dot_v = jnp.where(
                corr[None, :] > 1e-6,
                jnp.clip(inner / jnp.maximum(corr, 1e-12)[None, :], -1.0, 1.0),
                0.0,
            )
            v_dist = sn.astype(jnp.float32)
            d2 = (
                v_dist[None, :] ** 2
                + q_dist[:, None] ** 2
                - 2.0 * v_dist[None, :] * q_dist[:, None] * q_dot_v
            )
            d = jnp.sqrt(jnp.maximum(d2, 0.0))
        elif mode in ("hamming", "binary_asym"):
            # storage is packed uint32 [*, w]; pad bits are 0 on both sides
            # so the ±1 identity over w·32 lanes is exact hamming
            nbits = storage.shape[1] * 32
            x_pm = unpack_pm1(cell, nbits)
            if mode == "hamming":
                q_pm = unpack_pm1(qg, nbits)
                dot = jax.lax.dot_general(
                    q_pm, x_pm, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                d = (jnp.float32(nbits) - dot) * 0.5
            else:
                # queries are float projections zero-padded to w·32
                dot = jax.lax.dot_general(
                    qg.astype(jnp.bfloat16), x_pm, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                d = -dot
        elif mode == "sq8":
            dots = jax.lax.dot_general(
                qg, cell, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            sn_f = sn.astype(jnp.float32)
            if metric == Dist.COSINE:
                denom = jnp.sqrt(q_sq[qid])[:, None] * jnp.sqrt(sn_f)[None, :]
                d = jnp.where(denom > 0, 1.0 - dots / denom, 1.0)
            else:
                d = jnp.maximum(
                    q_sq[qid][:, None] + sn_f[None, :] - 2.0 * dots, 0.0
                )
        else:  # f32 / bf16 dense vectors
            lhs = qg.astype(storage.dtype) if mode == "bf16" else qg
            dots = jax.lax.dot_general(
                lhs, cell, (((1,), (1,)), ((), ())),
                precision=prec_f32 if mode == "f32" else None,
                preferred_element_type=jnp.float32,
            )
            if metric == Dist.COSINE:
                d = 1.0 - dots
            else:
                d = jnp.maximum(
                    q_sq[qid][:, None]
                    + sn.astype(jnp.float32)[None, :]
                    - 2.0 * dots,
                    0.0,
                )

        d = jnp.where(valid, d, _INF)
        kc = min(k_cell, cap)
        if approx:
            cd, ci = jax.lax.approx_min_k(d, kc)
        else:
            ncd, ci = jax.lax.top_k(-d, kc)     # [maxq, kc]
            cd = -ncd
        gi = start + ci
        md, mi = merge_topk(best_d[qid], best_i[qid], cd, gi, k)
        best_d = best_d.at[qid].set(md, mode="drop")
        best_i = best_i.at[qid].set(mi, mode="drop")
        return (best_d, best_i), None

    init = (
        jnp.full((nq + 1, k), _INF, jnp.float32),
        jnp.zeros((nq + 1, k), jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        step, init, jnp.arange(cluster_ids.shape[0])
    )
    return best_d, best_i
