"""IVF index tests (reference: cpu/ivf.rs:492-673 — recall vs exhaustive,
nprobe sweep, cosine mode, self-query, id remapping)."""

import numpy as np

from annsearch_tpu.models.exhaustive import ExhaustiveIndex
from annsearch_tpu.models.ivf import IvfIndex
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise
from annsearch_tpu.utils.metrics import calculate_recall
from annsearch_tpu.utils.validation import validate_index


def _setup(n=3000, dim=16, nclust=8, seed=0):
    x, _ = generate_clustered_data(n, dim, nclust, seed=seed)
    q = subsample_with_noise(x, 200, seed=seed)
    return x, q


def test_ivf_full_probe_is_exact():
    x, q = _setup(1000, 8)
    index = IvfIndex(x, "euclidean", nlist=10, seed=0)
    exact = ExhaustiveIndex(x, "euclidean")
    ti, td = exact.query(q, 10)
    ai, ad = index.query(q, 10, nprobe=10)  # probe all cells → exact
    assert calculate_recall(ti, ai, 10) > 0.999
    np.testing.assert_allclose(ad, td, rtol=1e-3, atol=1e-3)


def test_ivf_recall_increases_with_nprobe():
    x, q = _setup()
    index = IvfIndex(x, "euclidean", nlist=32, seed=0)
    exact = ExhaustiveIndex(x, "euclidean")
    ti, _ = exact.query(q, 10)
    recalls = []
    for nprobe in [1, 4, 16]:
        ai, _ = index.query(q, 10, nprobe=nprobe)
        recalls.append(calculate_recall(ti, ai, 10))
    assert recalls[0] <= recalls[1] <= recalls[2] + 1e-9
    assert recalls[2] > 0.95


def test_ivf_default_nprobe_recall():
    x, q = _setup()
    index = IvfIndex(x, "euclidean", seed=0)  # nlist=√n≈54, nprobe=√nlist≈7
    assert validate_index(index, k=10, n_samples=200) > 0.8


def test_ivf_cosine():
    x, q = _setup(2000, 16)
    index = IvfIndex(x, "cosine", nlist=16, seed=0)
    exact = ExhaustiveIndex(x, "cosine")
    ti, _ = exact.query(q, 10)
    ai, _ = index.query(q, 10, nprobe=16)
    assert calculate_recall(ti, ai, 10) > 0.999


def test_ivf_self_query_returns_self():
    x, _ = _setup(800, 8)
    index = IvfIndex(x, "euclidean", nlist=8, seed=0)
    idx, dist = index.generate_knn(5, nprobe=4)
    np.testing.assert_array_equal(idx[:, 0], np.arange(800))
    np.testing.assert_allclose(dist[:, 0], 0.0, atol=1e-3)


def test_ivf_k_clamp_and_ids_valid():
    x, q = _setup(300, 8)
    index = IvfIndex(x, "euclidean", nlist=5, seed=0)
    idx, dist = index.query(q[:10], 500, nprobe=5)
    assert idx.shape == (10, 300)
    assert (idx >= 0).all() and (idx < 300).all()
    # each row: unique ids (no duplicates from padding)
    for row in idx:
        assert len(np.unique(row)) == 300


def test_ivf_save_load(tmp_path):
    x, q = _setup(500, 8)
    index = IvfIndex(x, "euclidean", nlist=8, seed=0)
    p = str(tmp_path / "ivf.npz")
    index.save(p)
    loaded = IvfIndex.load(p)
    i1, d1 = index.query(q[:20], 5, nprobe=4)
    i2, d2 = loaded.query(q[:20], 5, nprobe=4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-6)


def test_ivf_memory_usage():
    x, _ = _setup(500, 8)
    index = IvfIndex(x, "euclidean", nlist=8, seed=0)
    assert index.memory_usage_bytes() > 500 * 8 * 4


def test_ivf_f64_pool_rescore():
    """f64 input + f64 queries → f64-exact ids+dists from IvfIndex.query
    (VERDICT r3 next-round #9; dist.rs f64 generics). Sub-f32-grain pairs
    must rank correctly at full probe."""
    from annsearch_tpu.models.ivf import IvfIndex

    rng = np.random.default_rng(21)
    base = rng.standard_normal((400, 16))
    x = np.concatenate([base, base + 1e-8 * rng.standard_normal((400, 16))])
    q = base[:50] + 1e-9
    index = IvfIndex(x, "euclidean", nlist=8, seed=0)
    ids, d = index.query(q, 5, nprobe=8)  # all cells probed → exact
    assert d.dtype == np.float64
    diff = q[:, None, :] - x[None]
    dm = np.einsum("qnd,qnd->qn", diff, diff)
    gt = np.argsort(dm, axis=1)[:, :5]
    gd = np.take_along_axis(dm, gt, axis=1)
    np.testing.assert_allclose(d, gd, rtol=1e-12, atol=0)
    agree = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(ids, gt)])
    assert agree >= 0.99


def test_ivf_exact_tier_certified():
    """The exact (approx=False) f32 tier carries a triangle-inequality
    probe certificate (VERDICT r3 #6, opt-in ``certify=True``): even at a
    deliberately starved nprobe the returned top-k must equal the
    exhaustive scan's — flagged
    queries re-probe until every unprobed cell's lower bound
    (|q−c| − r_c)² clears the kth distance."""
    from annsearch_tpu.models.exhaustive import ExhaustiveIndex
    from annsearch_tpu.utils.data import generate_data
    from annsearch_tpu.utils.metrics import calculate_recall

    x, _ = generate_data("lowrank", 6000, 16, 8, seed=3, intrinsic_dim=8)
    rng = np.random.default_rng(5)
    q = x[rng.choice(6000, 150, replace=False)] + np.float32(0.01)
    ti, td = ExhaustiveIndex(x, "euclidean").query(q, 10)
    index = IvfIndex(x, "euclidean", nlist=32, seed=0)

    ai0, _ = index.query(q, 10, nprobe=2)
    ai, d = index.query(q, 10, nprobe=2, certify=True)
    assert calculate_recall(ti, ai0, 10) < 1.0  # starved probes DO miss
    assert calculate_recall(ti, ai, 10) == 1.0
    np.testing.assert_allclose(d, td, rtol=2e-4, atol=1e-4)


def test_ivf_exact_tier_certified_cosine():
    from annsearch_tpu.models.exhaustive import ExhaustiveIndex
    from annsearch_tpu.utils.data import generate_data
    from annsearch_tpu.utils.metrics import calculate_recall

    x, _ = generate_data("lowrank", 6000, 16, 8, seed=3, intrinsic_dim=8)
    rng = np.random.default_rng(5)
    q = x[rng.choice(6000, 150, replace=False)] + np.float32(0.01)
    ti, _ = ExhaustiveIndex(x, "cosine").query(q, 10)
    index = IvfIndex(x, "cosine", nlist=32, seed=0)
    ai, _ = index.query(q, 10, nprobe=2, certify=True)
    assert calculate_recall(ti, ai, 10) == 1.0


def test_ivf_certify_rejects_quantised():
    import pytest

    from annsearch_tpu.models.quantised.ivf import IvfSq8Index

    x, _ = _setup(600, 16)
    index = IvfSq8Index(x, "euclidean", nlist=8, seed=0)
    with pytest.raises(ValueError, match="certify"):
        index.query(x[:10], 5, nprobe=2, certify=True)
