"""Benchmark metrics: recall@k, mean distance ratio, cluster purity.

Vectorised numpy re-derivations of the reference harness metrics
(``examples/commons/mod.rs:788-881``). Inputs are ``[nq, k]`` index/distance
arrays (this framework's query output format).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "calculate_recall",
    "calculate_mean_distance_ratio",
    "calculate_cluster_purity",
]


def calculate_recall(
    true_neighbors: np.ndarray, approx_neighbors: np.ndarray, k: int
) -> float:
    """Mean |top-k(true) ∩ top-k(approx)| / k (commons/mod.rs:788-809)."""
    t = np.asarray(true_neighbors)[:, :k]
    a = np.asarray(approx_neighbors)[:, :k]
    total = 0.0
    for ti, ai in zip(t, a):
        total += len(np.intersect1d(ti, ai, assume_unique=False)) / k
    return total / t.shape[0]


def calculate_mean_distance_ratio(
    true_dist: np.ndarray, approx_dist: np.ndarray, k: int
) -> float:
    """Mean over queries of Σ approx-dist / Σ true-dist for the top-k;
    queries with negligible true sum (<1e-12) excluded
    (commons/mod.rs:833-860). 1.0 = perfect."""
    td = np.asarray(true_dist, dtype=np.float64)[:, :k]
    ad = np.asarray(approx_dist, dtype=np.float64)[:, :k]
    st = td.sum(axis=1)
    sa = ad.sum(axis=1)
    valid = st > 1e-12
    if not valid.any():
        return float("nan")
    return float((sa[valid] / st[valid]).mean())


def calculate_cluster_purity(
    knn_graph: np.ndarray, cluster_labels: np.ndarray
) -> float:
    """Mean fraction of same-cluster neighbours (commons/mod.rs:868-881)."""
    g = np.asarray(knn_graph)
    labels = np.asarray(cluster_labels)
    same = labels[g] == labels[: g.shape[0], None]
    return float(same.mean())
