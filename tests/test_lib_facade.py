"""Facade surface tests: every public build_*/query_*/query_*_self triple.

The reference's lib.rs free functions are its primary user contract; these
tests drive each triple end-to-end on one shared fixture and assert the
shared semantics (reference test pattern, e.g. cpu/exhaustive.rs:281-543):
ascending distances, k > n clamping, self-query returns self at distance
~0 (graph-mode knn extraction excepted), ids in range.
"""

import numpy as np
import pytest

import annsearch_tpu as ann
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise

N, D, K = 900, 32, 8  # dim ≥ 32: the PQ trainer's reference assert


@pytest.fixture(scope="module")
def fx():
    x, _ = generate_clustered_data(N, D, 6, seed=11)
    q = subsample_with_noise(x, 50, seed=11)
    return x, q


# (name, build_fn, query_fn, self_fn, build_kw, query_kw, self_includes_self)
CASES = [
    ("exhaustive",
     ann.build_exhaustive_index, ann.query_exhaustive_index,
     ann.query_exhaustive_self, {}, {}, True),
    ("ivf",
     ann.build_ivf_index, ann.query_ivf_index, ann.query_ivf_self,
     {"nlist": 16}, {"nprobe": 16}, True),
    ("exhaustive-bf16",
     ann.build_exhaustive_bf16_index, ann.query_exhaustive_bf16_index,
     ann.query_exhaustive_bf16_self, {}, {}, True),
    ("exhaustive-sq8",
     ann.build_exhaustive_sq8_index, ann.query_exhaustive_sq8_index,
     ann.query_exhaustive_sq8_self, {}, {}, True),
    ("exhaustive-pq",
     lambda x: ann.build_exhaustive_pq_index(x, m=8),
     ann.query_exhaustive_pq_index, ann.query_exhaustive_pq_index_self,
     {}, {}, False),  # PQ reconstruction error can displace self
    ("exhaustive-opq",
     lambda x: ann.build_exhaustive_opq_index(x, m=8),
     ann.query_exhaustive_opq_index, ann.query_exhaustive_opq_index_self,
     {}, {}, False),
    ("ivf-bf16",
     ann.build_ivf_bf16_index, ann.query_ivf_bf16_index,
     ann.query_ivf_bf16_self, {"nlist": 16}, {"nprobe": 16}, True),
    ("ivf-sq8",
     ann.build_ivf_sq8_index, ann.query_ivf_sq8_index,
     ann.query_ivf_sq8_self, {"nlist": 16}, {"nprobe": 16}, True),
    ("ivf-pq",
     lambda x, **kw: ann.build_ivf_pq_index(x, m=8, **kw),
     ann.query_ivf_pq_index, ann.query_ivf_pq_index_self,
     {"nlist": 16}, {"nprobe": 16}, False),
    ("ivf-opq",
     lambda x, **kw: ann.build_ivf_opq_index(x, m=8, **kw),
     ann.query_ivf_opq_index, ann.query_ivf_opq_index_self,
     {"nlist": 16}, {"nprobe": 16}, False),
    ("binary",
     lambda x: ann.build_exhaustive_index_binary(x, n_bits=128),
     ann.query_exhaustive_index_binary, ann.query_exhaustive_index_binary_self,
     {}, {"rerank": "exact"}, True),
    ("ivf-binary",
     lambda x, **kw: ann.build_ivf_index_binary(x, n_bits=128, **kw),
     ann.query_ivf_index_binary, ann.query_ivf_index_binary_self,
     {"nlist": 16}, {"nprobe": 16, "rerank": "exact"}, True),
    ("rabitq",
     ann.build_exhaustive_index_rabitq, ann.query_exhaustive_index_rabitq,
     ann.query_exhaustive_index_rabitq_self, {}, {"rerank": "exact"}, True),
    ("ivf-rabitq",
     ann.build_ivf_index_rabitq, ann.query_ivf_index_rabitq,
     ann.query_ivf_index_rabitq_self,
     {"nlist": 16}, {"nprobe": 16, "rerank": "exact"}, True),
    ("nndescent",
     lambda x, **kw: ann.build_nndescent_index(x, k=10, **kw),
     ann.query_nndescent_index, None, {}, {}, False),
    ("hnsw",
     ann.build_hnsw_index, ann.query_hnsw_index, ann.query_hnsw_self,
     {"m": 8}, {"ef_search": 40}, True),
    ("vamana",
     ann.build_vamana_index, ann.query_vamana_index, ann.query_vamana_self,
     {"r_degree": 16}, {}, True),
    ("kmknn",
     ann.build_kmknn_index, ann.query_kmknn_index, ann.query_kmknn_self,
     {"nlist": 16}, {}, True),
    ("annoy",
     ann.build_annoy_index, ann.query_annoy_index, ann.query_annoy_self,
     {"n_trees": 8}, {}, True),
    ("balltree",
     ann.build_balltree_index, ann.query_balltree_index,
     ann.query_balltree_self, {}, {"budget": 0.3}, True),
    ("kdtree",
     ann.build_kd_tree_index, ann.query_kd_tree_index, ann.query_kd_tree_self,
     {"n_trees": 8}, {}, True),
    ("lsh",
     lambda x, **kw: ann.build_lsh_index(x, num_tables=4, bits_per_hash=6, **kw),
     ann.query_lsh_index, ann.query_lsh_self, {}, {}, True),
    ("exhaustive-gpu",
     ann.build_exhaustive_index_gpu, ann.query_exhaustive_index_gpu,
     ann.query_exhaustive_index_gpu_self, {}, {}, True),
    ("ivf-gpu",
     ann.build_ivf_index_gpu, ann.query_ivf_index_gpu,
     ann.query_ivf_index_gpu_self, {"nlist": 16}, {"nprobe": 16}, True),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_facade_triple(case, fx):
    name, build, query, self_fn, bkw, qkw, self_hit = case
    x, q = fx
    index = build(x, **bkw) if bkw else build(x)
    i, d = query(q, index, K, return_dist=True, **qkw)
    assert i.shape == (len(q), K) and d.shape == (len(q), K)
    assert (i >= 0).all() and (i < N).all()
    finite = np.isfinite(d)
    dd = np.where(finite, d, np.inf)
    assert (dd[:, :-1] <= dd[:, 1:] + 1e-5).all(), f"{name}: not ascending"
    # return_dist=False → (ids, None), the reference's (Mat, Option) contract
    only_i, none_d = query(q, index, K, **qkw)
    assert none_d is None
    assert isinstance(only_i, np.ndarray) and only_i.shape == (len(q), K)

    if self_fn is not None:
        si, sd = self_fn(index, 3, return_dist=True, **qkw)
        assert si.shape == (N, 3)
        if self_hit:
            hit = (si[:, 0] == np.arange(N)).mean()
            assert hit > 0.95, f"{name}: self-hit {hit}"
            # graph-family scoring carries ~1e-4-relative bf16-split
            # residue; assert self-distance is tiny vs the 2nd neighbour
            scale = max(float(np.nanmedian(sd[:, -1])), 1e-6)
            assert np.nanmedian(sd[:, 0]) < 0.01 * scale, name


@pytest.mark.parametrize(
    "case", [c for c in CASES if c[0] in ("exhaustive", "ivf", "kmknn", "hnsw")],
    ids=lambda c: c[0],
)
def test_facade_k_clamps_to_n(case, fx):
    name, build, query, _, bkw, qkw, _ = case
    x, q = fx
    small = x[:12]
    index = build(small, **bkw) if name != "ivf" else build(small, nlist=4)
    i, d = query(q[:5], index, 50, return_dist=True, **(
        qkw if name != "ivf" else {"nprobe": 4}
    ))
    assert i.shape[1] == 12  # clamped to n


def test_facade_unknown_metric_falls_back_to_euclidean(fx):
    x, q = fx
    a = ann.build_exhaustive_index(x, "no-such-metric")
    b = ann.build_exhaustive_index(x, "euclidean")
    ia, da = ann.query_exhaustive_index(q, a, 5, return_dist=True)
    ib, db = ann.query_exhaustive_index(q, b, 5, return_dist=True)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(da, db)


def test_facade_dim_mismatch_raises(fx):
    x, _ = fx
    index = ann.build_exhaustive_index(x)
    with pytest.raises(ValueError):
        ann.query_exhaustive_index(np.zeros((3, D + 1), np.float32), index, 3)


def test_validate_index_api(fx):
    """The shipped self-validation (reference KnnValidation,
    utils/mod.rs:62-196): recall of the index's own query vs brute force."""
    from annsearch_tpu.utils.validation import validate_index

    x, _ = fx
    rec = validate_index(ann.build_exhaustive_index(x), k=5, n_samples=200)
    assert rec > 0.999
    rec_ivf = validate_index(
        ann.build_ivf_index(x, nlist=16), k=5, n_samples=200
    )
    assert rec_ivf > 0.5


@pytest.mark.parametrize("builder,kw", [
    (ann.build_ivf_index, {"nlist": 16, "seed": 9}),
    (ann.build_annoy_index, {"n_trees": 4, "seed": 9}),
    (lambda x, **k: ann.build_lsh_index(x, num_tables=3, bits_per_hash=6, **k),
     {"seed": 9}),
    (lambda x, **k: ann.build_ivf_pq_index(x, m=8, nlist=16, **k), {"seed": 9}),
], ids=["ivf", "annoy", "lsh", "ivf-pq"])
def test_seed_reproducibility(builder, kw, fx):
    """Same seed → identical query results (reference pattern, e.g.
    annoy.rs seed tests)."""
    x, q = fx
    a = builder(x, **kw)
    b = builder(x, **kw)
    qa = q[:20]
    ia, da = (
        a.query(qa, 5) if not hasattr(a, "default_nprobe")
        else a.query(qa, 5)
    )
    ib, db = (
        b.query(qa, 5) if not hasattr(b, "default_nprobe")
        else b.query(qa, 5)
    )
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
