"""Save/load round-trips for the families VERDICT r1 flagged as untested
(trees) plus the binary family, whose derived state (binariser, rerank
store) must be rebuilt on load. Persistence itself is a parity-plus
capability (the reference has none — SURVEY §5 checkpoint/resume)."""

import numpy as np
import pytest

from annsearch_tpu.models.binary.flat import ExhaustiveIndexBinary
from annsearch_tpu.models.binary.ivf import IvfIndexBinary
from annsearch_tpu.models.binary.rabitq import ExhaustiveIndexRaBitQ
from annsearch_tpu.models.graph import NNDescentIndex
from annsearch_tpu.models.trees import AnnoyIndex, BallTreeIndex, KdTreeIndex
from annsearch_tpu.models.vamana import VamanaIndex
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise


@pytest.fixture(scope="module")
def pdata():
    x, _ = generate_clustered_data(2000, 32, 6, seed=3)
    q = subsample_with_noise(x, 50, seed=3)
    return x, q


def _roundtrip(index, cls, tmp_path, query_kw=None):
    query_kw = query_kw or {}
    p = str(tmp_path / "idx")
    i1, d1 = index.query(_roundtrip.q, 8, **query_kw)
    index.save(p)
    loaded = cls.load(p)
    i2, d2 = loaded.query(_roundtrip.q, 8, **query_kw)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)
    return loaded


@pytest.fixture(autouse=True)
def _bind_queries(pdata):
    _roundtrip.q = pdata[1]


def test_annoy_save_load(tmp_path, pdata):
    x, _ = pdata
    _roundtrip(AnnoyIndex(x, n_trees=8, seed=0), AnnoyIndex, tmp_path)


def test_kdtree_save_load(tmp_path, pdata):
    x, _ = pdata
    _roundtrip(KdTreeIndex(x, n_trees=8, seed=0), KdTreeIndex, tmp_path)


def test_balltree_save_load(tmp_path, pdata):
    x, _ = pdata
    _roundtrip(BallTreeIndex(x, seed=0), BallTreeIndex, tmp_path)


def test_vamana_save_load(tmp_path, pdata):
    x, _ = pdata
    _roundtrip(VamanaIndex(x, r_degree=16, seed=0), VamanaIndex, tmp_path)


def test_nndescent_save_load(tmp_path, pdata):
    x, _ = pdata
    _roundtrip(NNDescentIndex(x, k=8, seed=0), NNDescentIndex, tmp_path)


@pytest.mark.parametrize("mode", ["simhash", "pca"])
def test_binary_flat_save_load(tmp_path, pdata, mode):
    x, _ = pdata
    index = ExhaustiveIndexBinary(x, n_bits=64, binarisation=mode, seed=0)
    # hamming tier exercises the rebuilt binariser (projections + mean)
    loaded = _roundtrip(index, ExhaustiveIndexBinary, tmp_path)
    # asymmetric + exact tiers exercise projections and the rebuilt store
    for tier in ("asymmetric", "exact"):
        i1, _ = index.query(_roundtrip.q, 8, rerank=tier)
        i2, _ = loaded.query(_roundtrip.q, 8, rerank=tier)
        np.testing.assert_array_equal(i1, i2)


def test_binary_ivf_save_load(tmp_path, pdata):
    x, _ = pdata
    index = IvfIndexBinary(x, nlist=16, n_bits=64, seed=0)
    loaded = _roundtrip(index, IvfIndexBinary, tmp_path, {"nprobe": 8})
    i1, _ = index.query(_roundtrip.q, 8, nprobe=8, rerank="exact")
    i2, _ = loaded.query(_roundtrip.q, 8, nprobe=8, rerank="exact")
    np.testing.assert_array_equal(i1, i2)


def test_rabitq_save_load(tmp_path, pdata):
    x, _ = pdata
    index = ExhaustiveIndexRaBitQ(x, nlist=16, seed=0)
    loaded = _roundtrip(
        index, ExhaustiveIndexRaBitQ, tmp_path, {"rerank_factor": 4}
    )
    # the rerank store must survive the round-trip (r1 dropped it to None)
    assert loaded.store is not None


# -- full IVF-family coverage (VERDICT r2 item 9: every IvfBase subclass
#    must round-trip, not just the binary ones) -----------------------------


def test_ivf_save_load(tmp_path, pdata):
    from annsearch_tpu.models.ivf import IvfIndex

    x, _ = pdata
    _roundtrip(IvfIndex(x, nlist=16, seed=0), IvfIndex, tmp_path,
               {"nprobe": 8})


def test_ivf_bf16_save_load(tmp_path, pdata):
    from annsearch_tpu.models.quantised.ivf import IvfIndexBf16

    x, _ = pdata
    _roundtrip(IvfIndexBf16(x, nlist=16, seed=0), IvfIndexBf16, tmp_path,
               {"nprobe": 8})


def test_ivf_sq8_save_load(tmp_path, pdata):
    from annsearch_tpu.models.quantised.ivf import IvfSq8Index

    x, _ = pdata
    _roundtrip(IvfSq8Index(x, nlist=16, seed=0), IvfSq8Index, tmp_path,
               {"nprobe": 8})


def test_ivf_pq_save_load(tmp_path, pdata):
    from annsearch_tpu.models.quantised.ivf import IvfPqIndex

    x, _ = pdata
    _roundtrip(IvfPqIndex(x, nlist=16, m=8, seed=0), IvfPqIndex, tmp_path,
               {"nprobe": 8})


def test_ivf_pq_fastscan_save_load(tmp_path, pdata):
    # m == dim selects the int8 decode-cache fast-scan storage — its extra
    # arrays (decode cache + scales) must survive the round-trip too
    from annsearch_tpu.models.quantised.ivf import IvfPqIndex

    x, _ = pdata
    _roundtrip(IvfPqIndex(x, nlist=16, m=32, seed=0), IvfPqIndex, tmp_path,
               {"nprobe": 8})


def test_ivf_opq_save_load(tmp_path, pdata):
    from annsearch_tpu.models.quantised.ivf import IvfOpqIndex

    x, _ = pdata
    _roundtrip(IvfOpqIndex(x, nlist=16, m=8, seed=0), IvfOpqIndex, tmp_path,
               {"nprobe": 8})


def test_ivf_rabitq_save_load(tmp_path, pdata):
    from annsearch_tpu.models.binary.rabitq import IvfIndexRaBitQ

    x, _ = pdata
    index = IvfIndexRaBitQ(x, nlist=16, seed=0)
    loaded = _roundtrip(
        index, IvfIndexRaBitQ, tmp_path, {"nprobe": 8, "rerank_factor": 4}
    )
    assert loaded.store is not None


# -- remaining families ------------------------------------------------------


def test_exhaustive_save_load(tmp_path, pdata):
    from annsearch_tpu.models.exhaustive import ExhaustiveIndex

    x, _ = pdata
    _roundtrip(ExhaustiveIndex(x), ExhaustiveIndex, tmp_path)


@pytest.mark.parametrize("cls_name", ["bf16", "sq8", "pq", "opq"])
def test_flat_quantised_save_load(tmp_path, pdata, cls_name):
    from annsearch_tpu.models.quantised import flat as qflat

    cls = {
        "bf16": qflat.ExhaustiveIndexBf16,
        "sq8": qflat.ExhaustiveSq8Index,
        "pq": qflat.ExhaustivePqIndex,
        "opq": qflat.ExhaustiveOpqIndex,
    }[cls_name]
    x, _ = pdata
    kw = {"m": 8, "seed": 0} if cls_name in ("pq", "opq") else {}
    _roundtrip(cls(x, **kw), cls, tmp_path)


def test_hnsw_save_load(tmp_path, pdata):
    from annsearch_tpu.models.hnsw import HnswIndex

    x, _ = pdata
    _roundtrip(HnswIndex(x, m=8, seed=0), HnswIndex, tmp_path)


def test_kmknn_save_load(tmp_path, pdata):
    from annsearch_tpu.models.kmknn import KmknnIndex

    x, _ = pdata
    _roundtrip(KmknnIndex(x, seed=0), KmknnIndex, tmp_path)


def test_lsh_save_load(tmp_path, pdata):
    from annsearch_tpu.models.lsh import LSHIndex

    x, _ = pdata
    _roundtrip(
        LSHIndex(x, num_tables=4, bits_per_hash=8, seed=0), LSHIndex,
        tmp_path, {"n_probes": 4},
    )
