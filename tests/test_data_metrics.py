"""Synthetic data generator + metric tests."""

import numpy as np

from annsearch_tpu.utils.data import (
    generate_clustered_data,
    generate_clustered_data_high_dim,
    generate_data,
    generate_low_rank_rotated_data,
    generate_quantisation_stress,
    subsample_with_noise,
)
from annsearch_tpu.utils.metrics import (
    calculate_cluster_purity,
    calculate_mean_distance_ratio,
    calculate_recall,
)


def test_gaussian_shapes_and_determinism():
    x1, l1 = generate_clustered_data(500, 16, 5, seed=7)
    x2, l2 = generate_clustered_data(500, 16, 5, seed=7)
    assert x1.shape == (500, 16) and l1.shape == (500,)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(l1, l2)
    x3, _ = generate_clustered_data(500, 16, 5, seed=8)
    assert not np.allclose(x1, x3)


def test_gaussian_cluster_structure():
    x, labels = generate_clustered_data(2000, 8, 4, seed=1)
    # within-cluster spread should be well below between-centre spread
    centres = np.stack([x[labels == c].mean(0) for c in range(4)])
    within = np.mean([x[labels == c].std() for c in range(4)])
    between = np.linalg.norm(centres[0] - centres[1])
    assert between > within


def test_correlated_generator():
    x, labels = generate_clustered_data_high_dim(300, 32, 4, seed=3)
    assert x.shape == (300, 32)
    # dims 1..4 should correlate with dim 0 (first correlation group)
    c = np.corrcoef(x.T)
    assert np.abs(c[0, 1:5]).max() > 0.3


def test_lowrank_generator():
    x, _ = generate_low_rank_rotated_data(400, 64, 8, 4, seed=5)
    assert x.shape == (400, 64)
    # effective rank should be near the intrinsic dim
    s = np.linalg.svd(x - x.mean(0), compute_uv=False)
    energy = np.cumsum(s**2) / np.sum(s**2)
    assert energy[10] > 0.95


def test_quantisation_stress_generator():
    x, labels = generate_quantisation_stress(400, 32, 6, seed=9)
    assert x.shape == (400, 32)
    norms = np.linalg.norm(x, axis=1)
    # norm stratification: wide norm spread
    assert norms.max() / max(norms.min(), 1e-6) > 3


def test_generate_data_dispatch():
    for name in ["gaussian", "correlated", "lowrank", "quantisation"]:
        x, labels = generate_data(name, 100, 16, 3, seed=2, intrinsic_dim=4)
        assert x.shape == (100, 16)


def test_subsample_with_noise():
    x, _ = generate_clustered_data(100, 8, 3, seed=4)
    q = subsample_with_noise(x, 20, seed=4)
    assert q.shape == (20, 8)
    q2 = subsample_with_noise(x, 20, seed=4)
    np.testing.assert_array_equal(q, q2)


def test_recall_metric():
    true = np.array([[0, 1, 2], [3, 4, 5]])
    approx = np.array([[0, 1, 9], [3, 4, 5]])
    assert abs(calculate_recall(true, approx, 3) - (2 / 3 + 1) / 2) < 1e-9


def test_mean_distance_ratio():
    true = np.array([[1.0, 2.0], [1.0, 1.0]])
    approx = np.array([[1.5, 2.5], [1.0, 1.0]])
    r = calculate_mean_distance_ratio(true, approx, 2)
    assert abs(r - ((4.0 / 3.0) + 1.0) / 2) < 1e-9


def test_cluster_purity():
    knn = np.array([[0, 1], [0, 2], [3, 0]])
    labels = np.array([0, 0, 0, 1])
    # row0: both label0 = 1; row1: both label0 = 1; row2: [1,0] → 0.5
    assert abs(calculate_cluster_purity(knn, labels) - (1 + 1 + 0.5) / 3) < 1e-9
