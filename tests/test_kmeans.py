"""k-means engine tests (reference pattern: k_means_utils.rs tests —
assignment correctness, convergence on separated clusters, CSR layout)."""

import numpy as np
import jax.numpy as jnp

from annsearch_tpu.models.kmeans import (
    assign_clusters,
    build_cells,
    train_centroids,
    train_centroids_minibatch,
)
from annsearch_tpu.utils.dist import Dist, normalise
from annsearch_tpu.utils.data import generate_clustered_data


def test_assign_clusters_exact(rng):
    c = np.array([[0.0, 0.0], [10.0, 10.0]], dtype=np.float32)
    x = np.array([[1.0, 1.0], [9.0, 9.0], [0.5, -0.5]], dtype=np.float32)
    a, dmin = assign_clusters(jnp.asarray(x), jnp.asarray(c), Dist.EUCLIDEAN)
    np.testing.assert_array_equal(np.asarray(a), [0, 1, 0])
    np.testing.assert_allclose(np.asarray(dmin), [2.0, 2.0, 0.5], rtol=1e-5)


def test_train_recovers_separated_clusters():
    x, labels = generate_clustered_data(2000, 8, 4, seed=0)
    c = train_centroids(jnp.asarray(x), 4, Dist.EUCLIDEAN, seed=0)
    a, _ = assign_clusters(jnp.asarray(x), c, Dist.EUCLIDEAN)
    a = np.asarray(a)
    # each k-means cluster should be dominated by one true cluster
    purity = 0.0
    for cl in range(4):
        mask = a == cl
        if mask.sum() == 0:
            continue
        purity += np.bincount(labels[mask], minlength=4).max()
    assert purity / len(labels) > 0.95


def test_train_deterministic():
    x, _ = generate_clustered_data(500, 8, 3, seed=1)
    c1 = train_centroids(jnp.asarray(x), 5, Dist.EUCLIDEAN, seed=7)
    c2 = train_centroids(jnp.asarray(x), 5, Dist.EUCLIDEAN, seed=7)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2))


def test_train_cosine_unit_centroids():
    x, _ = generate_clustered_data(400, 8, 3, seed=2)
    xn = normalise(jnp.asarray(x))
    c = train_centroids(xn, 3, Dist.COSINE, seed=0)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(c), axis=1), np.ones(3), rtol=1e-4
    )


def test_large_k_random_init():
    x, _ = generate_clustered_data(3000, 8, 10, seed=3)
    c = train_centroids(jnp.asarray(x), 256, Dist.EUCLIDEAN, seed=0, max_iters=3)
    assert c.shape == (256, 8)
    assert np.isfinite(np.asarray(c)).all()


def test_minibatch_improves_quantisation(rng):
    x, _ = generate_clustered_data(5000, 8, 5, seed=4)
    xj = jnp.asarray(x)
    init = xj[rng.permutation(5000)[:16].copy()]
    c = train_centroids_minibatch(xj, init, 16, iters=30, batch=1024, seed=0)
    _, d0 = assign_clusters(xj, init, Dist.EUCLIDEAN)
    _, d1 = assign_clusters(xj, c, Dist.EUCLIDEAN)
    assert float(np.asarray(d1).mean()) < float(np.asarray(d0).mean())


def test_build_cells():
    a = np.array([2, 0, 0, 1, 2, 2])
    members, counts, order = build_cells(a, 3)
    np.testing.assert_array_equal(counts, [2, 1, 3])
    assert members.shape == (3, 3)
    np.testing.assert_array_equal(members[0, :2], [1, 2])
    np.testing.assert_array_equal(members[1, :1], [3])
    np.testing.assert_array_equal(members[2], [0, 4, 5])
    assert members[1, 1] == -1
    # order is cluster-sorted, stable
    np.testing.assert_array_equal(order, [1, 2, 3, 0, 4, 5])


def test_build_cells_empty_cluster():
    a = np.array([0, 0, 2])
    members, counts, order = build_cells(a, 4)
    np.testing.assert_array_equal(counts, [2, 0, 1, 0])


def test_segment_layout_invariants(rng):
    """Segments tile each cluster's sorted range exactly: counts sum to the
    cell sizes, offsets are contiguous per cluster, every segment ≤ cap,
    cluster_ptr CSR is consistent, skewed cells split."""
    from annsearch_tpu.models.kmeans import segment_layout

    nlist = 7
    # heavy skew: one giant cell, one empty
    a = np.concatenate([
        np.zeros(900, np.int64),
        rng.integers(2, nlist, 300),
    ])
    rng.shuffle(a)
    lay = segment_layout(a, nlist, seg_size=128)
    counts = np.bincount(a, minlength=nlist)
    assert lay.seg_size == 128
    assert (lay.seg_counts >= 1).all() and (lay.seg_counts <= 128).all()
    for c in range(nlist):
        segs = range(lay.cluster_ptr[c], lay.cluster_ptr[c + 1])
        assert sum(int(lay.seg_counts[s]) for s in segs) == counts[c]
        for j, s in enumerate(segs):
            assert lay.seg_cluster[s] == c
            assert lay.seg_offsets[s] == int(
                np.concatenate([[0], np.cumsum(counts)])[c]
            ) + j * 128
    # giant cell split into ceil(900/128) = 8 segments; empty cell has none
    assert lay.cluster_ptr[1] - lay.cluster_ptr[0] == 8
    assert lay.cluster_ptr[2] - lay.cluster_ptr[1] == 0
    # sorted order groups clusters
    assert (np.diff(a[lay.order]) >= 0).all()


def test_expand_probes_to_segments_covers_split_cells(rng):
    from annsearch_tpu.models.kmeans import (
        expand_probes_to_segments,
        segment_layout,
    )

    a = np.concatenate([np.zeros(300, np.int64), np.ones(40, np.int64)])
    lay = segment_layout(a, 2, seg_size=128)
    qs, segs = expand_probes_to_segments(np.array([[0], [1], [0]]), lay)
    # query 0 and 2 probe cluster 0 → 3 segments each; query 1 → 1 segment
    assert sorted(qs[segs < 3].tolist()).count(0) == 3
    assert (qs == 1).sum() == 1
