"""``utils/validation.validate_index`` — the reference's KnnValidation
trait (utils/mod.rs:62-196): an index self-reports recall@k vs brute force
on sampled stored vectors."""

import numpy as np

from annsearch_tpu.models.exhaustive import ExhaustiveIndex
from annsearch_tpu.models.ivf import IvfIndex
from annsearch_tpu.utils.validation import validate_index


def _data(rng, n=400, d=8):
    return rng.standard_normal((n, d)).astype(np.float32)


def test_validate_exhaustive_is_perfect(rng):
    x = _data(rng)
    assert validate_index(ExhaustiveIndex(x, "euclidean"), k=5) == 1.0


def test_validate_samples_at_most_n_samples(rng):
    x = _data(rng, n=50)
    # n_samples > n must not crash (samples all 50)
    r = validate_index(ExhaustiveIndex(x, "euclidean"), k=3, n_samples=1000)
    assert r == 1.0


def test_validate_ivf_full_probe_is_perfect(rng):
    x = _data(rng)
    idx = IvfIndex(x, "euclidean", nlist=8, seed=0)
    r = validate_index(idx, k=5, n_samples=100, nprobe=8)
    assert r == 1.0


def test_validate_ivf_partial_probe_below_full(rng):
    x = _data(rng, n=600)
    idx = IvfIndex(x, "euclidean", nlist=16, seed=0)
    r1 = validate_index(idx, k=5, n_samples=100, nprobe=1)
    r16 = validate_index(idx, k=5, n_samples=100, nprobe=16)
    assert r16 == 1.0
    assert r1 <= r16


def test_validate_seed_reproducible(rng):
    x = _data(rng)
    idx = IvfIndex(x, "euclidean", nlist=8, seed=0)
    a = validate_index(idx, k=5, seed=7, n_samples=64, nprobe=2)
    b = validate_index(idx, k=5, seed=7, n_samples=64, nprobe=2)
    assert a == b
