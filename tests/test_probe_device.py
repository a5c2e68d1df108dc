"""On-device probe-list construction (``ops/probe_device``) — structural
semantics plus end-to-end scan parity with the host builder
(``ops/ivf_scan.build_probe_lists_from_pairs``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from annsearch_tpu.models.kmeans import segment_layout
from annsearch_tpu.ops.ivf_scan import (
    build_probe_lists_from_pairs,
    ivf_cluster_scan,
)
from annsearch_tpu.ops.probe_device import (
    build_probe_lists_device,
    device_probe_shapes,
    expand_probes_device,
)
from annsearch_tpu.utils.dist import Dist, sq_norms


def test_device_lists_structural():
    """Every (q, t) pair lands in exactly one scan lane: lists[row, col]
    holds q and cluster_ids[row] holds the probed segment."""
    rng = np.random.default_rng(0)
    nq, T, nseg = 37, 5, 11
    probes = rng.integers(0, nseg, size=(nq, T)).astype(np.int32)
    maxq, R = device_probe_shapes(nq, T, nseg, 1)
    cids, lists, gmap = (
        np.asarray(a)
        for a in build_probe_lists_device(jnp.asarray(probes), nseg, maxq, R)
    )
    rows, cols = gmap // maxq, gmap % maxq
    assert np.all(lists[rows, cols] == np.arange(nq)[:, None])
    assert np.all(cids[rows] == probes)
    # padding lanes hold the sentinels
    used = np.zeros((R, maxq), bool)
    used[rows, cols] = True
    assert np.all(lists[~used] == nq)


def test_device_lists_sentinel_probes():
    """Sentinel probes (id == nseg, from segment expansion slots) must map
    to rows whose cluster id is the sentinel segment."""
    nq, nseg = 8, 6
    probes = np.full((nq, 3), nseg, np.int32)
    probes[:, 0] = np.arange(nq) % nseg
    maxq, R = device_probe_shapes(nq, 3, nseg, 1)
    cids, lists, gmap = (
        np.asarray(a)
        for a in build_probe_lists_device(jnp.asarray(probes), nseg, maxq, R)
    )
    rows = gmap // maxq
    assert np.all(cids[rows[:, 1:]] == nseg)


def test_expand_probes_device_matches_csr():
    """Cluster → segment expansion must follow the CSR pointer, with
    sentinel ids past each cluster's segment count."""
    ptr = np.array([0, 2, 3, 6], np.int32)  # clusters of 2, 1, 3 segments
    probes = np.array([[0, 2], [1, 0]], np.int32)
    out = np.asarray(
        expand_probes_device(jnp.asarray(probes), jnp.asarray(ptr), 3, 6)
    )
    np.testing.assert_array_equal(
        out, [[0, 1, 6, 3, 4, 5], [2, 6, 6, 0, 1, 6]]
    )


@pytest.mark.parametrize("metric", [Dist.EUCLIDEAN, Dist.COSINE])
def test_scan_parity_device_vs_host_lists(metric):
    """The exact cluster scan must return identical (dists, ids) whether
    the task lists were built on host or on device."""
    rng = np.random.default_rng(1)
    n, d, nlist, nq, nprobe, k = 600, 16, 8, 25, 3, 7
    x = rng.standard_normal((n, d)).astype(np.float32)
    if metric == Dist.COSINE:
        x /= np.linalg.norm(x, axis=1, keepdims=True)
    assign = rng.integers(0, nlist, size=n)
    layout = segment_layout(assign, nlist)
    xs = x[layout.order]
    storage = jnp.asarray(
        np.concatenate([xs, np.zeros((layout.seg_size, d), np.float32)])
    )
    sqn = sq_norms(storage)
    offs = jnp.asarray(layout.seg_offsets)
    cnts = jnp.asarray(layout.seg_counts)
    nseg = len(layout.seg_offsets)
    cents = jnp.zeros((nseg, d), jnp.float32)
    q = jnp.asarray(rng.standard_normal((nq, d)).astype(np.float32))

    seg_probes = rng.integers(0, nseg, size=(nq, nprobe)).astype(np.int32)

    cids_h, lists_h, gmap_h = build_probe_lists_from_pairs(
        np.repeat(np.arange(nq), nprobe), seg_probes.reshape(-1), nseg, nq
    )
    dh, ih = ivf_cluster_scan(
        q, jnp.asarray(cids_h), jnp.asarray(lists_h), jnp.asarray(gmap_h),
        storage, sqn, offs, cnts, cents, k, metric, layout.seg_size, "f32",
    )

    maxq, R = device_probe_shapes(nq, nprobe, nseg, 1)
    cids_d, lists_d, gmap_d = build_probe_lists_device(
        jnp.asarray(seg_probes), nseg, maxq, R
    )
    dd, id_ = ivf_cluster_scan(
        q, cids_d, lists_d, gmap_d,
        storage, sqn, offs, cnts, cents, k, metric, layout.seg_size, "f32",
    )
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dd), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ih), np.asarray(id_))
