"""Exhaustive index behaviour tests (reference: cpu/exhaustive.rs:281-543 —
self-query at distance 0, sorted output, k>n clamp, euclidean vs cosine)."""

import numpy as np

import annsearch_tpu as ann
from annsearch_tpu.models.exhaustive import ExhaustiveIndex
from annsearch_tpu.utils.metrics import calculate_recall


def test_self_query_returns_self(small_points):
    index = ann.build_exhaustive_index(small_points, "euclidean")
    idx, dist = ann.query_exhaustive_index(small_points, index, 3, return_dist=True)
    np.testing.assert_array_equal(idx[:, 0], np.arange(5))
    np.testing.assert_allclose(dist[:, 0], np.zeros(5), atol=1e-5)


def test_squared_euclidean_semantics(small_points):
    index = ann.build_exhaustive_index(small_points, "euclidean")
    q = np.array([[0.0, 0.0, 0.0]], dtype=np.float32)
    idx, dist = ann.query_exhaustive_index(q, index, 5, return_dist=True)
    # nearest: any unit vector at squared distance 1
    assert dist[0, 0] == np.float32(1.0)
    assert set(idx[0, :3].tolist()) == {0, 1, 2}
    # farthest: [2,0,0] at squared distance 4
    assert idx[0, -1] == 4
    np.testing.assert_allclose(dist[0, -1], 4.0, atol=1e-5)


def test_cosine_semantics():
    pts = np.array([[1.0, 0.0], [0.0, 1.0], [10.0, 0.0]], dtype=np.float32)
    index = ann.build_exhaustive_index(pts, "cosine")
    q = np.array([[2.0, 0.0]], dtype=np.float32)
    idx, dist = ann.query_exhaustive_index(q, index, 3, return_dist=True)
    # cosine ignores magnitude: [1,0] and [10,0] both at distance 0
    np.testing.assert_allclose(dist[0, :2], [0.0, 0.0], atol=1e-5)
    assert set(idx[0, :2].tolist()) == {0, 2}
    np.testing.assert_allclose(dist[0, 2], 1.0, atol=1e-5)  # orthogonal


def test_k_greater_than_n_clamped(small_points):
    index = ann.build_exhaustive_index(small_points, "euclidean")
    idx, dist = ann.query_exhaustive_index(small_points[:2], index, 100, return_dist=True)
    assert idx.shape == (2, 5)


def test_return_dist_flag(small_points):
    index = ann.build_exhaustive_index(small_points, "euclidean")
    idx, dist = ann.query_exhaustive_index(small_points, index, 2, return_dist=False)
    assert dist is None


def test_self_knn_full_recall(rng):
    x = rng.standard_normal((200, 16)).astype(np.float32)
    index = ann.build_exhaustive_index(x, "euclidean")
    idx, dist = ann.query_exhaustive_self(index, 5, return_dist=True)
    assert idx.shape == (200, 5)
    np.testing.assert_array_equal(idx[:, 0], np.arange(200))
    # compare against numpy brute force
    full = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    expect = np.argsort(full, axis=1)[:, :5]
    assert calculate_recall(expect, idx, 5) > 0.999


def test_query_matches_numpy_brute_force(rng):
    x = rng.standard_normal((500, 32)).astype(np.float32)
    q = rng.standard_normal((50, 32)).astype(np.float32)
    index = ann.build_exhaustive_index(x, "euclidean")
    idx, dist = ann.query_exhaustive_index(q, index, 10, return_dist=True)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    expect_d = np.sort(full, axis=1)[:, :10]
    np.testing.assert_allclose(dist, expect_d, rtol=1e-3, atol=1e-3)


def test_dim_mismatch_raises(small_points):
    index = ann.build_exhaustive_index(small_points, "euclidean")
    try:
        index.query(np.zeros((2, 7), np.float32), 2)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_save_load(tmp_path, rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    index = ann.build_exhaustive_index(x, "cosine")
    p = str(tmp_path / "exh.npz")
    index.save(p)
    loaded = ExhaustiveIndex.load(p)
    i1, d1 = index.query(x[:5], 3)
    i2, d2 = loaded.query(x[:5], 3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-6)
    assert loaded.memory_usage_bytes() == index.memory_usage_bytes()


def test_memory_usage(small_points):
    index = ann.build_exhaustive_index(small_points, "euclidean")
    # vectors 5*3*4 + sqnorms 5*4
    assert index.memory_usage_bytes() == 5 * 3 * 4 + 5 * 4


def test_f64_inputs_get_f64_grade_results():
    """f64 matrices keep a host copy; queries pre-select on device in f32
    HIGHEST and rescore the pool in f64 on host (the reference's dist.rs
    is generic over f32/f64 — dist.rs:113-2263)."""
    rng = np.random.default_rng(11)
    # tight-gap data: base points + tiny perturbations below f32 grain
    base = rng.standard_normal((400, 16))
    x = np.concatenate([base, base + 1e-8 * rng.standard_normal((400, 16))])
    q = base[:50] + 1e-9
    idx = ExhaustiveIndex(x, "euclidean")
    ids, d = idx.query(q, 5)
    assert d.dtype == np.float64
    # exact f64 ground truth must match ids AND distances
    diff = q[:, None, :] - x[None]
    dm = np.einsum("qnd,qnd->qn", diff, diff)
    gt = np.argsort(dm, axis=1)[:, :5]
    gd = np.take_along_axis(dm, gt, axis=1)
    np.testing.assert_allclose(d, gd, rtol=1e-12, atol=0)
    # id agreement (allow permutation among exact ties)
    agree = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(ids, gt)])
    assert agree >= 0.99


def test_f64_cosine_rescore():
    rng = np.random.default_rng(12)
    x = rng.standard_normal((500, 24))
    q = x[:40] + 1e-3 * rng.standard_normal((40, 24))
    idx = ExhaustiveIndex(x, "cosine")
    ids, d = idx.query(q, 8)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    dm = 1.0 - qn @ xn.T
    gt = np.argsort(dm, axis=1)[:, :8]
    agree = np.mean([len(set(a) & set(b)) / 8 for a, b in zip(ids, gt)])
    assert agree >= 0.99
    np.testing.assert_allclose(
        np.sort(d, 1), np.sort(np.take_along_axis(dm, gt, 1), 1), atol=1e-9
    )
