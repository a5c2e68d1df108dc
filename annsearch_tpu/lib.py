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

__all__ = [
    "build_exhaustive_index",
    "query_exhaustive_index",
    "query_exhaustive_self",
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
