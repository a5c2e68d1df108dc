"""Unit tests for the exact rerank ops (``ops/rerank.py``).

Reference pattern: exhaustive_binary.rs rerank-tier tests — a cheap scan
proposes candidates, the exact tier re-scores them; these tests pin the
dedup/masking/ordering semantics of that tier in isolation.
"""

import numpy as np
import jax.numpy as jnp

from annsearch_tpu.ops.rerank import (
    _dedup_select,
    rerank_exact,
    rerank_from_store,
)
from annsearch_tpu.utils.dist import Dist


def test_dedup_select_removes_duplicate_ids():
    ids = jnp.array([[3, 1, 3, 2, 1]])
    d = jnp.array([[0.5, 0.2, 0.1, 0.9, 0.7]])
    dd, ii = _dedup_select(ids, d, 3)
    # best copy of each id survives: id 3 -> 0.1, id 1 -> 0.2, id 2 -> 0.9
    np.testing.assert_allclose(np.asarray(dd)[0], [0.1, 0.2, 0.9], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ii)[0], [3, 1, 2])


def test_dedup_select_keeps_best_copy_under_ties():
    # equal distances for the same id must still yield one copy
    ids = jnp.array([[5, 5, 5, 7]])
    d = jnp.array([[0.4, 0.4, 0.4, 0.3]])
    dd, ii = _dedup_select(ids, d, 2)
    np.testing.assert_array_equal(np.asarray(ii)[0], [7, 5])
    np.testing.assert_allclose(np.asarray(dd)[0], [0.3, 0.4], atol=1e-6)


def test_dedup_select_all_duplicates_pads_with_inf():
    ids = jnp.array([[4, 4, 4, 4]])
    d = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    dd, ii = _dedup_select(ids, d, 3)
    dd = np.asarray(dd)[0]
    assert dd[0] == 1.0
    assert np.isinf(dd[1:]).all()


def test_rerank_exact_hand_computed_euclidean():
    q = jnp.array([[0.0, 0.0]])
    cand = jnp.array([[[3.0, 4.0], [1.0, 0.0], [0.0, 2.0]]])
    ids = jnp.array([[10, 11, 12]], dtype=jnp.int32)
    valid = jnp.ones((1, 3), bool)
    d, i = rerank_exact(q, cand, ids, valid, 3, Dist.EUCLIDEAN)
    np.testing.assert_allclose(np.asarray(d)[0], [1.0, 4.0, 25.0], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i)[0], [11, 12, 10])


def test_rerank_exact_masks_invalid_slots():
    q = jnp.array([[0.0, 0.0]])
    cand = jnp.zeros((1, 3, 2))  # all at distance 0 — but two are invalid
    ids = jnp.array([[1, 2, 3]], dtype=jnp.int32)
    valid = jnp.array([[False, True, False]])
    d, i = rerank_exact(q, cand, ids, valid, 2, Dist.EUCLIDEAN)
    assert np.asarray(i)[0, 0] == 2
    assert np.isinf(np.asarray(d)[0, 1])


def test_rerank_exact_cosine_matches_numpy(rng):
    nq, kc, dim = 4, 8, 16
    q = rng.standard_normal((nq, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cand = rng.standard_normal((nq, kc, dim)).astype(np.float32)
    ids = np.arange(nq * kc, dtype=np.int32).reshape(nq, kc)
    d, i = rerank_exact(
        jnp.asarray(q), jnp.asarray(cand), jnp.asarray(ids),
        jnp.ones((nq, kc), bool), kc, Dist.COSINE,
    )
    cn = cand / np.linalg.norm(cand, axis=-1, keepdims=True)
    want = 1.0 - np.einsum("qd,qcd->qc", q, cn)
    want_sorted = np.sort(want, axis=1)
    np.testing.assert_allclose(np.asarray(d), want_sorted, atol=1e-5)


def test_rerank_from_store_matches_direct_gather(rng):
    n, dim, nq, kc, k = 64, 8, 13, 6, 4
    store = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((nq, dim)).astype(np.float32)
    cand_i = rng.integers(0, n, size=(nq, kc)).astype(np.int32)
    cand_d = rng.random((nq, kc)).astype(np.float32)
    # invalidate a few slots via inf scan distance
    cand_d[0, 0] = np.inf
    cand_d[5, 3] = np.inf

    d, i = rerank_from_store(
        jnp.asarray(q), jnp.asarray(cand_d), jnp.asarray(cand_i),
        jnp.asarray(store), k, Dist.EUCLIDEAN, qb=8,
    )
    d, i = np.asarray(d), np.asarray(i)

    # reference computation in numpy with the same dedup/mask semantics
    for qi in range(nq):
        exact = ((q[qi][None] - store[cand_i[qi]]) ** 2).sum(-1)
        exact[~np.isfinite(cand_d[qi])] = np.inf
        best = {}
        for cid, dd in zip(cand_i[qi], exact):
            if np.isfinite(dd) and (cid not in best or dd < best[cid]):
                best[cid] = dd
        want = sorted(best.values())[:k]
        got = d[qi][np.isfinite(d[qi])]
        np.testing.assert_allclose(got, want[: len(got)], atol=1e-4)
        # returned ids score to the returned distances
        for dd, ii in zip(d[qi], i[qi]):
            if np.isfinite(dd):
                np.testing.assert_allclose(
                    ((q[qi] - store[ii]) ** 2).sum(), dd, atol=1e-4
                )


def test_rerank_from_store_query_block_padding(rng):
    """nq not a multiple of qb exercises the pad-and-slice path."""
    n, dim, k = 32, 4, 3
    store = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((7, dim)).astype(np.float32)
    cand_i = rng.integers(0, n, size=(7, 5)).astype(np.int32)
    cand_d = np.zeros((7, 5), np.float32)
    d_a, i_a = rerank_from_store(
        jnp.asarray(q), jnp.asarray(cand_d), jnp.asarray(cand_i),
        jnp.asarray(store), k, Dist.EUCLIDEAN, qb=4,
    )
    d_b, i_b = rerank_from_store(
        jnp.asarray(q), jnp.asarray(cand_d), jnp.asarray(cand_i),
        jnp.asarray(store), k, Dist.EUCLIDEAN, qb=512,
    )
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))


def test_rerank_from_store_out_of_range_ids_clamped(rng):
    """Sentinel/pad ids beyond the store must not crash or return garbage
    rows as winners (they are invalid via inf scan distance)."""
    n, dim = 16, 4
    store = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((2, dim)).astype(np.float32)
    cand_i = np.array([[0, 1, n + 5], [2, n + 9, 3]], np.int32)
    cand_d = np.array(
        [[0.0, 0.0, np.inf], [0.0, np.inf, 0.0]], np.float32
    )
    d, i = rerank_from_store(
        jnp.asarray(q), jnp.asarray(cand_d), jnp.asarray(cand_i),
        jnp.asarray(store), 2, Dist.EUCLIDEAN,
    )
    assert np.asarray(i).max() < n
    assert np.isfinite(np.asarray(d)).all()
