"""Bigger-than-HBM streaming exhaustive index (host-resident database)."""

import numpy as np
import pytest

from annsearch_tpu.models.exhaustive import ExhaustiveIndex
from annsearch_tpu.models.streaming import StreamingExhaustiveIndex
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise


def test_streaming_matches_resident_exact():
    x, _ = generate_clustered_data(5000, 24, 8, seed=13)
    q = subsample_with_noise(x, 200, seed=13)
    res = ExhaustiveIndex(x)
    ti, td = res.query(q, 10)
    stream = StreamingExhaustiveIndex(x)
    si, sd = stream.query(q, 10, chunk_rows=1024)  # forces 5 chunks + pad
    np.testing.assert_array_equal(si, ti)
    np.testing.assert_allclose(sd, td, rtol=1e-3, atol=5e-4)


def test_streaming_from_mmap_file(tmp_path):
    x, _ = generate_clustered_data(3000, 16, 6, seed=14)
    q = subsample_with_noise(x, 100, seed=14)
    stream = StreamingExhaustiveIndex.write(str(tmp_path / "db"), x)
    si, sd = stream.query(q, 5, chunk_rows=777)
    ti, td = ExhaustiveIndex(x).query(q, 5)
    np.testing.assert_array_equal(si, ti)
    np.testing.assert_allclose(sd, td, rtol=1e-3, atol=5e-4)


def test_streaming_cosine():
    x, _ = generate_clustered_data(2000, 16, 5, seed=15)
    q = subsample_with_noise(x, 80, seed=15)
    si, sd = StreamingExhaustiveIndex(x, "cosine").query(q, 5, chunk_rows=512)
    ti, td = ExhaustiveIndex(x, "cosine").query(q, 5)
    np.testing.assert_array_equal(si, ti)
    np.testing.assert_allclose(sd, td, rtol=1e-3, atol=1e-5)


def test_streaming_self_knn():
    x, _ = generate_clustered_data(1500, 12, 4, seed=16)
    idx = StreamingExhaustiveIndex(x)
    i, d = idx.generate_knn(3, chunk_rows=400)
    assert (i[:, 0] == np.arange(1500)).all()
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-3)
