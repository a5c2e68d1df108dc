"""Unit tests for the Vamana α-robust prune (models/vamana.robust_prune).

Mirrors the reference's vamana.rs in-file prune tests (vamana.rs:665-700
semantics: keep candidate v unless an earlier-kept closer neighbour w has
α·d(w,v) < d(u,v)) on hand-computed colinear fixtures.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from annsearch_tpu.models.vamana import VamanaIndex, robust_prune
from annsearch_tpu.utils.dist import Dist, sq_norms


def _line_fixture():
    """4 points + sentinel row. Node 0's candidates ascending by squared
    distance: a=(1,0) d=1, b=(1.05,0.1) d=1.1125, c=(20,0) d=400.
    With α=1.2: b is dominated by a (1.2·d(a,b)≈0.02 < 1.1125); c survives
    against BOTH earlier ranks (1.2·d(a,c)=433 ≥ 400, 1.2·d(b,c)≈431 ≥ 400
    — the prune's rank-order relaxation lets pruned candidates dominate
    later ranks, so the fixture must clear every earlier rank)."""
    pts = np.zeros((5, 2), np.float32)
    pts[1] = (1.0, 0.0)
    pts[2] = (1.05, 0.1)
    pts[3] = (20.0, 0.0)
    vecs = jnp.asarray(pts)
    sq = sq_norms(vecs)
    n = 4
    # every node gets the same candidate list [1, 2, 3] (self-loops are the
    # caller's job to exclude; rows 1-3 aren't asserted on)
    ids = jnp.broadcast_to(jnp.array([1, 2, 3], jnp.int32), (n, 3))
    d0 = np.array([1.0, 1.1125, 400.0], np.float32)
    dists = jnp.broadcast_to(jnp.asarray(d0), (n, 3))
    return vecs, sq, ids, dists, n


def test_robust_prune_drops_dominated_candidate():
    vecs, sq, ids, dists, n = _line_fixture()
    out = np.asarray(
        robust_prune(vecs, sq, ids, dists, 1.2, 2, Dist.EUCLIDEAN)
    )
    # node 0: a (id 1) kept first; b (id 2) dominated by a; c (id 3) kept
    assert out.shape == (n, 2)
    assert out[0, 0] == 1
    assert out[0, 1] == 3


def test_robust_prune_alpha_one_prunes_more_than_large_alpha():
    """dominated = α·d(w,v) < d(u,v): larger α shrinks the dominated set,
    keeping longer-range edges (the DiskANN highway property)."""
    vecs, sq, ids, dists, _ = _line_fixture()
    keep_small = np.asarray(
        robust_prune(vecs, sq, ids, dists, 1.0, 3, Dist.EUCLIDEAN)
    )[0]
    keep_large = np.asarray(
        robust_prune(vecs, sq, ids, dists, 10.0, 3, Dist.EUCLIDEAN)
    )[0]
    # at α=1.0, c IS dominated by a (1·361 < 400 → pruned); at α=10 it is
    # not (10·361 ≥ 400 → kept), so c appears among the kept prefix
    assert keep_large.tolist()[:2] == [1, 3]
    # α=1.0 prunes both b and c → only a survives; pruned ids follow in
    # rank order
    assert keep_small.tolist() == [1, 2, 3]


def test_robust_prune_rank_one_always_kept():
    vecs, sq, ids, dists, n = _line_fixture()
    for alpha in (1.0, 1.2, 2.0):
        out = np.asarray(
            robust_prune(vecs, sq, ids, dists, alpha, 2, Dist.EUCLIDEAN)
        )
        assert (out[:, 0] == 1).all()


def test_robust_prune_sentinel_neighbours_sort_last():
    vecs, sq, ids, dists, n = _line_fixture()
    ids = ids.at[:, 1].set(n)  # replace b with the sentinel id
    dists = dists.at[:, 1].set(jnp.inf)
    out = np.asarray(
        robust_prune(vecs, sq, ids, dists, 1.2, 3, Dist.EUCLIDEAN)
    )
    # kept real candidates (a, c) come first; sentinel last
    assert out[0, 0] == 1
    assert out[0, 1] == 3
    assert out[0, 2] == n


def test_robust_prune_cosine_mode_runs():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((9, 8)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    vecs = jnp.asarray(np.concatenate([pts, np.zeros((1, 8), np.float32)]))
    sq = sq_norms(vecs)
    n = 9
    dots = pts @ pts.T
    d = 1.0 - dots
    np.fill_diagonal(d, np.inf)
    order = np.argsort(d, axis=1)[:, :4]
    dd = np.take_along_axis(d, order, axis=1)
    out = np.asarray(
        robust_prune(
            vecs, sq, jnp.asarray(order, jnp.int32), jnp.asarray(dd),
            1.2, 3, Dist.COSINE,
        )
    )
    assert out.shape == (n, 3)
    # rank-1 candidate always kept
    assert (out[:, 0] == order[:, 0]).all()


def test_vamana_highway_edges_exist():
    """A clustered dataset must produce at least some cross-cluster edges
    (the α>1 highway property the second pass + random pool provide)."""
    rng = np.random.default_rng(1)
    a = rng.standard_normal((120, 8)).astype(np.float32)
    b = rng.standard_normal((120, 8)).astype(np.float32) + 40.0
    x = np.concatenate([a, b])
    idx = VamanaIndex(x, r_degree=8, alpha=1.3)
    g = np.asarray(idx.graph)[:240]
    labels = np.concatenate([np.zeros(120, np.int64), np.ones(120, np.int64)])
    valid = g < 240
    src = np.repeat(labels, g.shape[1]).reshape(g.shape)
    dst = labels[np.clip(g, 0, 239)]
    cross = ((src != dst) & valid).sum()
    assert cross > 0
