"""Running top-k tests: agreement with full-sort ground truth across chunk
sizes, padding, and masking (reference pattern: dist_gpu.rs top-k kernel
tests on the CPU runtime)."""

import numpy as np
import jax.numpy as jnp

from annsearch_tpu.ops.topk import blocked_query_topk, chunked_topk, merge_topk
from annsearch_tpu.utils.dist import Dist, normalise


def _brute(q, x, metric):
    if metric == Dist.COSINE:
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        return 1.0 - qn @ xn.T
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


def test_chunked_topk_exact_euclidean(rng):
    q = rng.standard_normal((13, 24)).astype(np.float32)
    x = rng.standard_normal((333, 24)).astype(np.float32)
    k = 7
    d, i = chunked_topk(jnp.asarray(q), jnp.asarray(x), k, Dist.EUCLIDEAN, db_chunk=64)
    full = _brute(q, x, Dist.EUCLIDEAN)
    expect_i = np.argsort(full, axis=1)[:, :k]
    expect_d = np.take_along_axis(full, expect_i, axis=1)
    np.testing.assert_allclose(np.asarray(d), expect_d, rtol=1e-3, atol=1e-3)
    # indices may differ on ties; compare via distances of chosen indices
    chosen = np.take_along_axis(full, np.asarray(i), axis=1)
    np.testing.assert_allclose(chosen, expect_d, rtol=1e-3, atol=1e-3)


def test_chunked_topk_cosine(rng):
    q = rng.standard_normal((5, 16)).astype(np.float32)
    x = rng.standard_normal((101, 16)).astype(np.float32)
    k = 4
    d, i = chunked_topk(
        normalise(jnp.asarray(q)), normalise(jnp.asarray(x)), k, Dist.COSINE, db_chunk=32
    )
    full = _brute(q, x, Dist.COSINE)
    expect_d = np.sort(full, axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(d), expect_d, rtol=1e-3, atol=1e-4)


def test_topk_sorted_ascending(rng):
    q = rng.standard_normal((3, 8)).astype(np.float32)
    x = rng.standard_normal((50, 8)).astype(np.float32)
    d, _ = chunked_topk(jnp.asarray(q), jnp.asarray(x), 10, Dist.EUCLIDEAN, db_chunk=16)
    d = np.asarray(d)
    assert (np.diff(d, axis=1) >= -1e-6).all()


def test_n_valid_masking(rng):
    x = rng.standard_normal((40, 8)).astype(np.float32)
    q = x[:2]
    # only the first 20 rows are valid
    d, i = chunked_topk(
        jnp.asarray(q), jnp.asarray(x), 5, Dist.EUCLIDEAN, n_valid=20, db_chunk=16
    )
    assert (np.asarray(i) < 20).all()


def test_blocked_query_topk_matches_chunked(rng):
    q = rng.standard_normal((37, 12)).astype(np.float32)
    x = rng.standard_normal((90, 12)).astype(np.float32)
    d1, i1 = blocked_query_topk(
        jnp.asarray(q), jnp.asarray(x), 6, Dist.EUCLIDEAN, query_block=8, db_chunk=32
    )
    full = _brute(q, x, Dist.EUCLIDEAN)
    expect_d = np.sort(full, axis=1)[:, :6]
    np.testing.assert_allclose(np.asarray(d1), expect_d, rtol=1e-3, atol=1e-3)


def test_merge_topk():
    d_a = jnp.array([[0.1, 0.5, 0.9]])
    i_a = jnp.array([[1, 2, 3]])
    d_b = jnp.array([[0.2, 0.3, 1.5]])
    i_b = jnp.array([[4, 5, 6]])
    d, i = merge_topk(d_a, i_a, d_b, i_b, 3)
    np.testing.assert_allclose(np.asarray(d), [[0.1, 0.2, 0.3]], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), [[1, 4, 5]])


def test_bins_topk_matches_exact(rng):
    from annsearch_tpu.ops.topk import chunked_topk_bins

    q = rng.standard_normal((9, 16)).astype(np.float32)
    x = rng.standard_normal((700, 16)).astype(np.float32)
    d, i = chunked_topk_bins(
        jnp.asarray(q), jnp.asarray(x), 5, Dist.EUCLIDEAN, bins=128
    )
    full = _brute(q, x, Dist.EUCLIDEAN)
    expect = np.sort(full, axis=1)[:, :5]
    # bins is near-exact (loss needs 3 of top-5 in one residue class)
    close = np.isclose(np.asarray(d), expect, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.97


def test_bins_topk_masks_invalid(rng):
    from annsearch_tpu.ops.topk import chunked_topk_bins

    x = rng.standard_normal((300, 8)).astype(np.float32)
    d, i = chunked_topk_bins(
        jnp.asarray(x[:3]), jnp.asarray(x), 4, Dist.EUCLIDEAN,
        n_valid=150, bins=128,
    )
    assert (np.asarray(i) < 150).all()


def test_blocked_selector_bins(rng):
    q = rng.standard_normal((17, 12)).astype(np.float32)
    x = rng.standard_normal((900, 12)).astype(np.float32)
    d, i = blocked_query_topk(
        jnp.asarray(q), jnp.asarray(x), 6, Dist.EUCLIDEAN,
        query_block=8, db_chunk=128, selector="bins",
    )
    full = _brute(q, x, Dist.EUCLIDEAN)
    expect = np.sort(full, axis=1)[:, :6]
    close = np.isclose(np.asarray(d), expect, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.97


def test_chunked_topk_k_equals_n(rng):
    from annsearch_tpu.ops.topk import chunked_topk
    from annsearch_tpu.utils.dist import Dist

    q = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((13, 8)).astype(np.float32))
    d, i = chunked_topk(q, x, 13, Dist.EUCLIDEAN, db_chunk=5)
    # every row id appears exactly once per query
    for row in np.asarray(i):
        assert sorted(row.tolist()) == list(range(13))
    assert (np.diff(np.asarray(d), axis=1) >= -1e-5).all()


def test_chunked_topk_single_row_db(rng):
    from annsearch_tpu.ops.topk import chunked_topk
    from annsearch_tpu.utils.dist import Dist

    q = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))
    d, i = chunked_topk(q, x, 1, Dist.EUCLIDEAN)
    assert i.shape == (3, 1) and (np.asarray(i) == 0).all()


def test_merge_topk_with_all_inf_side(rng):
    from annsearch_tpu.ops.topk import merge_topk

    d1 = jnp.asarray([[1.0, 2.0, 3.0]])
    i1 = jnp.asarray([[5, 6, 7]], dtype=jnp.int32)
    d2 = jnp.full((1, 3), jnp.inf)
    i2 = jnp.zeros((1, 3), jnp.int32)
    md, mi = merge_topk(d1, i1, d2, i2, 3)
    np.testing.assert_array_equal(np.asarray(mi), [[5, 6, 7]])
    np.testing.assert_allclose(np.asarray(md), [[1.0, 2.0, 3.0]])


def test_approx_selector_recall_close_to_exact(rng):
    from annsearch_tpu.ops.topk import chunked_topk
    from annsearch_tpu.utils.dist import Dist

    q = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((4096, 16)).astype(np.float32))
    de, ie = chunked_topk(q, x, 10, Dist.EUCLIDEAN)
    da, ia = chunked_topk(q, x, 10, Dist.EUCLIDEAN, approx=True)
    overlap = np.asarray([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(np.asarray(ie), np.asarray(ia))
    ])
    assert overlap.mean() > 0.95
