"""Index self-validation: recall@k of an index against brute force.

Equivalent of the reference's ``KnnValidation`` trait
(``src/utils/mod.rs:62-196``): sample ≤ ``n_samples`` stored vectors, compute
exact ground truth with the exhaustive scan, query the index on the same
vectors, report recall@k.
"""

from __future__ import annotations

import numpy as np

from .metrics import calculate_recall

__all__ = ["validate_index"]


def validate_index(
    index,
    k: int = 15,
    seed: int = 42,
    n_samples: int = 1000,
    **query_kwargs,
) -> float:
    """Recall@k of ``index.query`` vs exact search on sampled stored vectors."""
    from ..models.exhaustive import ExhaustiveIndex

    vecs = index.vectors_original_order()
    n = vecs.shape[0]
    rng = np.random.default_rng(seed)
    sample = rng.permutation(n)[: min(n_samples, n)]
    queries = vecs[sample]

    exact = ExhaustiveIndex(vecs, index.metric.value)
    true_idx, _ = exact.query(queries, k)
    approx_idx, _ = index.query(queries, k, **query_kwargs)
    return calculate_recall(true_idx, approx_idx, k)
