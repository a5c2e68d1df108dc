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

__all__ = [
    "build_exhaustive_index",
    "query_exhaustive_index",
    "query_exhaustive_self",
    "build_ivf_index",
    "query_ivf_index",
    "query_ivf_self",
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
