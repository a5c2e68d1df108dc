"""Public API facade.

Free-function surface mirroring the reference's ``src/lib.rs``
(``build_<index>_index`` / ``query_<index>_index`` / ``query_<index>_self``).
Queries return ``(indices [nq, k] int, distances [nq, k] f32 | None)`` —
the array analogue of the reference's ``(Vec<Vec<usize>>, Option<Vec<Vec<T>>>)``.

Batch parallelism is implicit: instead of a rayon ``par_iter`` over query rows
(lib.rs:84-121) the whole query matrix is streamed through jitted blocked
kernels on the TPU.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .models.exhaustive import ExhaustiveIndex
from .models.ivf import IvfIndex
from .models.quantised import (
    ExhaustiveIndexBf16,
    ExhaustiveOpqIndex,
    ExhaustivePqIndex,
    ExhaustiveSq8Index,
    IvfIndexBf16,
    IvfOpqIndex,
    IvfPqIndex,
    IvfSq8Index,
)

__all__ = [
    "build_exhaustive_index",
    "query_exhaustive_index",
    "query_exhaustive_self",
    "build_ivf_index",
    "query_ivf_index",
    "query_ivf_self",
    "build_exhaustive_bf16_index",
    "query_exhaustive_bf16_index",
    "query_exhaustive_bf16_self",
    "build_exhaustive_sq8_index",
    "query_exhaustive_sq8_index",
    "query_exhaustive_sq8_self",
    "build_exhaustive_pq_index",
    "query_exhaustive_pq_index",
    "query_exhaustive_pq_index_self",
    "build_exhaustive_opq_index",
    "query_exhaustive_opq_index",
    "query_exhaustive_opq_index_self",
    "build_ivf_bf16_index",
    "query_ivf_bf16_index",
    "query_ivf_bf16_self",
    "build_ivf_sq8_index",
    "query_ivf_sq8_index",
    "query_ivf_sq8_self",
    "build_ivf_pq_index",
    "query_ivf_pq_index",
    "query_ivf_pq_index_self",
    "build_ivf_opq_index",
    "query_ivf_opq_index",
    "query_ivf_opq_index_self",
    "build_exhaustive_index_binary",
    "query_exhaustive_index_binary",
    "query_exhaustive_index_binary_self",
    "build_ivf_index_binary",
    "query_ivf_index_binary",
    "query_ivf_index_binary_self",
    "build_exhaustive_index_rabitq",
    "query_exhaustive_index_rabitq",
    "query_exhaustive_index_rabitq_self",
    "build_ivf_index_rabitq",
    "query_ivf_index_rabitq",
    "query_ivf_index_rabitq_self",
]


def _maybe_dist(idx: np.ndarray, dist: np.ndarray, return_dist: bool):
    return (idx, dist) if return_dist else (idx, None)


# ----------------------------------------------------------------------------
# Exhaustive (reference lib.rs:211-271)
# ----------------------------------------------------------------------------


def build_exhaustive_index(mat: Any, dist_metric: str = "euclidean") -> ExhaustiveIndex:
    return ExhaustiveIndex(mat, dist_metric)


def query_exhaustive_index(
    query_mat: Any,
    index: ExhaustiveIndex,
    k: int,
    return_dist: bool = False,
    verbose: bool = False,
):
    idx, dist = index.query(query_mat, k)
    return _maybe_dist(idx, dist, return_dist)


def query_exhaustive_self(
    index: ExhaustiveIndex,
    k: int,
    return_dist: bool = False,
    verbose: bool = False,
):
    idx, dist = index.generate_knn(k)
    return _maybe_dist(idx, dist, return_dist)


# ----------------------------------------------------------------------------
# IVF (reference lib.rs:658-766)
# ----------------------------------------------------------------------------


def build_ivf_index(
    mat: Any,
    nlist: int | None = None,
    max_iters: int | None = None,
    dist_metric: str = "euclidean",
    seed: int = 42,
    verbose: bool = False,
) -> IvfIndex:
    return IvfIndex(
        mat,
        dist_metric,
        nlist=nlist,
        max_iters=30 if max_iters is None else max_iters,
        seed=seed,
        verbose=verbose,
    )


def query_ivf_index(
    query_mat: Any,
    index: IvfIndex,
    k: int,
    nprobe: int | None = None,
    return_dist: bool = False,
    verbose: bool = False,
):
    idx, dist = index.query(query_mat, k, nprobe=nprobe)
    return _maybe_dist(idx, dist, return_dist)


def query_ivf_self(
    index: IvfIndex,
    k: int,
    nprobe: int | None = None,
    return_dist: bool = False,
    verbose: bool = False,
):
    idx, dist = index.generate_knn(k, nprobe=nprobe)
    return _maybe_dist(idx, dist, return_dist)


# ----------------------------------------------------------------------------
# Quantised flat indexes (reference lib.rs:1191-1565)
# ----------------------------------------------------------------------------


def build_exhaustive_bf16_index(mat: Any, dist_metric: str = "euclidean") -> ExhaustiveIndexBf16:
    return ExhaustiveIndexBf16(mat, dist_metric)


def query_exhaustive_bf16_index(query_mat, index, k, return_dist=False, verbose=False):
    return _maybe_dist(*index.query(query_mat, k), return_dist)


def query_exhaustive_bf16_self(index, k, return_dist=False, verbose=False):
    return _maybe_dist(*index.generate_knn(k), return_dist)


def build_exhaustive_sq8_index(mat: Any, dist_metric: str = "euclidean") -> ExhaustiveSq8Index:
    return ExhaustiveSq8Index(mat, dist_metric)


def query_exhaustive_sq8_index(query_mat, index, k, return_dist=False, verbose=False):
    return _maybe_dist(*index.query(query_mat, k), return_dist)


def query_exhaustive_sq8_self(index, k, return_dist=False, verbose=False):
    return _maybe_dist(*index.generate_knn(k), return_dist)


def build_exhaustive_pq_index(
    mat: Any, m: int = 16, dist_metric: str = "euclidean", seed: int = 42,
    verbose: bool = False,
) -> ExhaustivePqIndex:
    return ExhaustivePqIndex(mat, m=m, metric=dist_metric, seed=seed)


def query_exhaustive_pq_index(query_mat, index, k, return_dist=False, verbose=False):
    return _maybe_dist(*index.query(query_mat, k), return_dist)


def query_exhaustive_pq_index_self(index, k, return_dist=False, verbose=False):
    return _maybe_dist(*index.generate_knn(k), return_dist)


def build_exhaustive_opq_index(
    mat: Any, m: int = 16, dist_metric: str = "euclidean", seed: int = 42,
    verbose: bool = False,
) -> ExhaustiveOpqIndex:
    return ExhaustiveOpqIndex(mat, m=m, metric=dist_metric, seed=seed)


def query_exhaustive_opq_index(query_mat, index, k, return_dist=False, verbose=False):
    return _maybe_dist(*index.query(query_mat, k), return_dist)


def query_exhaustive_opq_index_self(index, k, return_dist=False, verbose=False):
    return _maybe_dist(*index.generate_knn(k), return_dist)


# ----------------------------------------------------------------------------
# Quantised IVF indexes (reference lib.rs:1567-1996)
# ----------------------------------------------------------------------------


def build_ivf_bf16_index(
    mat: Any, nlist=None, max_iters=None, dist_metric="euclidean", seed=42,
    verbose=False,
) -> IvfIndexBf16:
    return IvfIndexBf16(
        mat, dist_metric, nlist=nlist,
        max_iters=30 if max_iters is None else max_iters, seed=seed,
        verbose=verbose,
    )


def query_ivf_bf16_index(query_mat, index, k, nprobe=None, return_dist=False, verbose=False):
    return _maybe_dist(*index.query(query_mat, k, nprobe=nprobe), return_dist)


def query_ivf_bf16_self(index, k, nprobe=None, return_dist=False, verbose=False):
    return _maybe_dist(*index.generate_knn(k, nprobe=nprobe), return_dist)


def build_ivf_sq8_index(
    mat: Any, nlist=None, max_iters=None, dist_metric="euclidean", seed=42,
    verbose=False,
) -> IvfSq8Index:
    return IvfSq8Index(
        mat, dist_metric, nlist=nlist,
        max_iters=30 if max_iters is None else max_iters, seed=seed,
        verbose=verbose,
    )


def query_ivf_sq8_index(query_mat, index, k, nprobe=None, return_dist=False, verbose=False):
    return _maybe_dist(*index.query(query_mat, k, nprobe=nprobe), return_dist)


def query_ivf_sq8_self(index, k, nprobe=None, return_dist=False, verbose=False):
    return _maybe_dist(*index.generate_knn(k, nprobe=nprobe), return_dist)


def build_ivf_pq_index(
    mat: Any, nlist=None, m: int = 16, max_iters=None, dist_metric="euclidean",
    seed=42, verbose=False,
) -> IvfPqIndex:
    return IvfPqIndex(
        mat, dist_metric, nlist=nlist, m=m,
        max_iters=30 if max_iters is None else max_iters, seed=seed,
        verbose=verbose,
    )


def query_ivf_pq_index(query_mat, index, k, nprobe=None, return_dist=False, verbose=False):
    return _maybe_dist(*index.query(query_mat, k, nprobe=nprobe), return_dist)


def query_ivf_pq_index_self(index, k, nprobe=None, return_dist=False, verbose=False):
    return _maybe_dist(*index.generate_knn(k, nprobe=nprobe), return_dist)


def build_ivf_opq_index(
    mat: Any, nlist=None, m: int = 16, max_iters=None, dist_metric="euclidean",
    seed=42, verbose=False,
) -> IvfOpqIndex:
    return IvfOpqIndex(
        mat, dist_metric, nlist=nlist, m=m,
        max_iters=30 if max_iters is None else max_iters, seed=seed,
        verbose=verbose,
    )


def query_ivf_opq_index(query_mat, index, k, nprobe=None, return_dist=False, verbose=False):
    return _maybe_dist(*index.query(query_mat, k, nprobe=nprobe), return_dist)


def query_ivf_opq_index_self(index, k, nprobe=None, return_dist=False, verbose=False):
    return _maybe_dist(*index.generate_knn(k, nprobe=nprobe), return_dist)


# ----------------------------------------------------------------------------
# Binary indexes (reference lib.rs:2402-2689)
# ----------------------------------------------------------------------------


def build_exhaustive_index_binary(
    mat: Any, dist_metric: str = "euclidean", n_bits=None,
    binarisation: str = "simhash", seed: int = 42, store=True,
    verbose: bool = False,
):
    from .models.binary import ExhaustiveIndexBinary

    return ExhaustiveIndexBinary(
        mat, dist_metric, n_bits=n_bits, binarisation=binarisation,
        seed=seed, store=store,
    )


def query_exhaustive_index_binary(
    query_mat, index, k, rerank=None, rerank_factor=20,
    return_dist=False, verbose=False,
):
    return _maybe_dist(
        *index.query(query_mat, k, rerank=rerank, rerank_factor=rerank_factor),
        return_dist,
    )


def query_exhaustive_index_binary_self(
    index, k, rerank=None, rerank_factor=20, return_dist=False, verbose=False
):
    return _maybe_dist(
        *index.generate_knn(k, rerank=rerank, rerank_factor=rerank_factor),
        return_dist,
    )


def build_ivf_index_binary(
    mat: Any, dist_metric: str = "euclidean", nlist=None, n_bits=None,
    binarisation: str = "simhash", max_iters=None, seed: int = 42,
    store=True, verbose: bool = False,
):
    from .models.binary import IvfIndexBinary

    return IvfIndexBinary(
        mat, dist_metric, nlist=nlist, n_bits=n_bits,
        binarisation=binarisation,
        max_iters=30 if max_iters is None else max_iters, seed=seed,
        store=store, verbose=verbose,
    )


def query_ivf_index_binary(
    query_mat, index, k, nprobe=None, rerank=None, rerank_factor=20,
    return_dist=False, verbose=False,
):
    return _maybe_dist(
        *index.query(
            query_mat, k, nprobe=nprobe, rerank=rerank,
            rerank_factor=rerank_factor,
        ),
        return_dist,
    )


def query_ivf_index_binary_self(
    index, k, nprobe=None, rerank=None, rerank_factor=20,
    return_dist=False, verbose=False,
):
    return _maybe_dist(
        *index.generate_knn(
            k, nprobe=nprobe, rerank=rerank, rerank_factor=rerank_factor
        ),
        return_dist,
    )


# ----------------------------------------------------------------------------
# RaBitQ indexes (reference lib.rs:2691-2930)
# ----------------------------------------------------------------------------


def build_exhaustive_index_rabitq(
    mat: Any, dist_metric: str = "euclidean", nlist=None, max_iters=None,
    seed: int = 42, store=True, verbose: bool = False,
):
    from .models.binary.rabitq import ExhaustiveIndexRaBitQ

    return ExhaustiveIndexRaBitQ(
        mat, dist_metric, nlist=nlist,
        max_iters=30 if max_iters is None else max_iters, seed=seed,
        store=store, verbose=verbose,
    )


def query_exhaustive_index_rabitq(
    query_mat, index, k, nprobe=None, rerank=None, rerank_factor=10,
    return_dist=False, verbose=False,
):
    return _maybe_dist(
        *index.query(query_mat, k, nprobe=nprobe, rerank=rerank,
                     rerank_factor=rerank_factor),
        return_dist,
    )


def query_exhaustive_index_rabitq_self(
    index, k, nprobe=None, rerank=None, rerank_factor=10,
    return_dist=False, verbose=False,
):
    return _maybe_dist(
        *index.generate_knn(k, nprobe=nprobe, rerank=rerank,
                            rerank_factor=rerank_factor),
        return_dist,
    )


def build_ivf_index_rabitq(
    mat: Any, dist_metric: str = "euclidean", nlist=None, max_iters=None,
    seed: int = 42, store=True, verbose: bool = False,
):
    from .models.binary.rabitq import IvfIndexRaBitQ

    return IvfIndexRaBitQ(
        mat, dist_metric, nlist=nlist,
        max_iters=30 if max_iters is None else max_iters, seed=seed,
        store=store, verbose=verbose,
    )


def query_ivf_index_rabitq(
    query_mat, index, k, nprobe=None, rerank=None, rerank_factor=10,
    return_dist=False, verbose=False,
):
    return _maybe_dist(
        *index.query(query_mat, k, nprobe=nprobe, rerank=rerank,
                     rerank_factor=rerank_factor),
        return_dist,
    )


def query_ivf_index_rabitq_self(
    index, k, nprobe=None, rerank=None, rerank_factor=10,
    return_dist=False, verbose=False,
):
    return _maybe_dist(
        *index.generate_knn(k, nprobe=nprobe, rerank=rerank,
                            rerank_factor=rerank_factor),
        return_dist,
    )
