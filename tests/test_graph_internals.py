"""Graph-construction kernel internals (``ops/graph.py``).

Reference analogues: nndescent.rs new/old incremental candidate flags
(:706-801), GPU reverse-candidate reservoir (nndescent_gpu.rs:289), CAGRA
rank-based detour pruning (nndescent_gpu.rs:827) and reverse-edge fill
(:934-1056)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from annsearch_tpu.ops.graph import (
    _reverse_sample,
    add_reverse_edges,
    cagra_prune,
    nnd_round,
    random_init_graph,
)
from annsearch_tpu.utils.dist import Dist, sq_norms


def _padded(rng, n=200, d=8):
    x = rng.standard_normal((n, d)).astype(np.float32)
    xp = jnp.concatenate([jnp.asarray(x), jnp.zeros((1, d))])
    return x, xp, sq_norms(xp)


def _true_knn(x, kk):
    d = ((x[:, None, :] - x[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    return np.argsort(d, axis=1)[:, :kk]


def test_reverse_sample_entries_are_real_reverse_edges(rng):
    n, kk, r = 64, 4, 8
    gids = jnp.asarray(
        rng.integers(0, n, size=(n, kk)).astype(np.int32)
    )
    rev = np.asarray(_reverse_sample(jax.random.PRNGKey(0), gids, n, r))
    assert rev.shape == (n, r)
    g = np.asarray(gids)
    for v in range(n):
        for u in rev[v]:
            if u == n:  # sentinel slot
                continue
            assert v in g[u], f"{u}->{v} is not an edge"


def test_nnd_round_improves_graph(rng):
    x, xp, sq = _padded(rng)
    kk = 8
    ids, dists = random_init_graph(jax.random.PRNGKey(1), xp, sq, kk,
                                   Dist.EUCLIDEAN)
    before = float(jnp.mean(dists[jnp.isfinite(dists)]))
    ids2, d2, upd, fresh = nnd_round(
        jax.random.PRNGKey(2), xp, sq, ids, dists, kk, Dist.EUCLIDEAN,
        tile=64,
    )
    after = float(jnp.mean(d2[jnp.isfinite(d2)]))
    assert after < before
    assert int(upd) > 0
    assert fresh.shape == (x.shape[0], kk)


def test_nnd_round_fresh_flags_mark_only_changed_slots(rng):
    x, xp, sq = _padded(rng, n=128)
    kk = 6
    ids, dists = random_init_graph(jax.random.PRNGKey(3), xp, sq, kk,
                                   Dist.EUCLIDEAN)
    ids2, d2, _, fresh = nnd_round(
        jax.random.PRNGKey(4), xp, sq, ids, dists, kk, Dist.EUCLIDEAN,
        tile=64,
    )
    ids_np, ids2_np = np.asarray(ids), np.asarray(ids2)
    fresh_np = np.asarray(fresh)
    for u in range(ids_np.shape[0]):
        prev = set(ids_np[u].tolist())
        for j in range(kk):
            assert fresh_np[u, j] == (ids2_np[u, j] not in prev)


def test_nnd_round_with_flags_converges_like_full(rng):
    """The incremental new/old path must reach the same quality as full
    rescans (it only skips candidate pairs that were already tried)."""
    x, xp, sq = _padded(rng, n=256, d=6)
    kk = 8
    key = jax.random.PRNGKey(5)
    ids_a, d_a = random_init_graph(key, xp, sq, kk, Dist.EUCLIDEAN)
    # rp-forest init like the real builds (random init alone plateaus on
    # one-sided NND at this tiny scale)
    from annsearch_tpu.ops.graph import rp_forest_round

    ids_a, d_a = rp_forest_round(
        jax.random.PRNGKey(9), xp, sq, ids_a, d_a, 2, 64, kk,
        Dist.EUCLIDEAN,
    )
    ids_b, d_b = ids_a, d_a
    fresh = None
    for r in range(5):
        k = jax.random.PRNGKey(10 + r)
        ids_a, d_a, _, _ = nnd_round(
            k, xp, sq, ids_a, d_a, kk, Dist.EUCLIDEAN, tile=64
        )
        ids_b, d_b, _, fresh = nnd_round(
            k, xp, sq, ids_b, d_b, kk, Dist.EUCLIDEAN, tile=64,
            new_in=fresh, c_active=4 * kk,
        )
    true = _true_knn(x, kk)
    def rec(ids):
        return np.mean([
            len(set(np.asarray(ids)[u]) & set(true[u])) / kk
            for u in range(x.shape[0])
        ])

    rec_a, rec_b = rec(ids_a), rec(ids_b)
    # the flags path only skips candidate pairs that were already tried —
    # it must track the full-rescan path's quality, not trail it
    assert rec_b > rec_a - 0.07, (rec_a, rec_b)
    assert rec_a > 0.5  # both made real progress from random init


def test_nnd_round_update_count_decays(rng):
    """Update counts must shrink over rounds (convergence signal the
    builds' early-exit uses)."""
    x, xp, sq = _padded(rng, n=256, d=6)
    kk = 8
    ids, dists = random_init_graph(jax.random.PRNGKey(6), xp, sq, kk,
                                   Dist.EUCLIDEAN)
    upds = []
    for r in range(4):
        ids, dists, upd, _ = nnd_round(
            jax.random.PRNGKey(20 + r), xp, sq, ids, dists, kk,
            Dist.EUCLIDEAN, tile=64,
        )
        upds.append(int(upd))
    assert upds[-1] < upds[0]


@pytest.mark.parametrize("metric", [Dist.EUCLIDEAN, Dist.COSINE])
def test_cagra_prune_output_shape_and_membership(rng, metric):
    x, xp, sq = _padded(rng, n=96)
    n, kk, out_deg = 96, 8, 4
    if metric == Dist.COSINE:
        xp = xp / jnp.maximum(jnp.linalg.norm(xp, axis=1, keepdims=True),
                              1e-30)
        sq = sq_norms(xp)
        xn = np.asarray(xp)[:n]
        dm = 1.0 - xn @ xn.T
    else:
        xn = np.asarray(xp)[:n]
        dm = ((xn[:, None, :] - xn[None]) ** 2).sum(-1)
    np.fill_diagonal(dm, np.inf)
    true = np.argsort(dm, axis=1)[:, :kk]
    d = np.take_along_axis(dm, true, axis=1)
    pruned = cagra_prune(
        xp, sq, jnp.asarray(true.astype(np.int32)),
        jnp.asarray(d.astype(np.float32)), out_deg, metric, tile=32,
    )
    pruned = np.asarray(pruned)
    assert pruned.shape == (n, out_deg)
    # survivors come from the input neighbour set
    for u in range(n):
        assert set(pruned[u]) <= set(true[u])
        # no duplicates within a row
        assert len(set(pruned[u])) == out_deg


def test_cagra_prune_keeps_rank_one(rng):
    """The closest neighbour can never be detoured (no closer w exists)."""
    x, xp, sq = _padded(rng, n=64)
    kk, out_deg = 6, 3
    dm = ((x[:, None, :] - x[None]) ** 2).sum(-1)
    np.fill_diagonal(dm, np.inf)
    true = np.argsort(dm, axis=1)[:, :kk]
    d = np.take_along_axis(dm, true, axis=1)
    pruned = np.asarray(cagra_prune(
        xp, sq, jnp.asarray(true.astype(np.int32)),
        jnp.asarray(d.astype(np.float32)), out_deg, Dist.EUCLIDEAN,
        tile=32,
    ))
    assert (pruned[:, 0] == true[:, 0]).all()


def test_add_reverse_edges_appends_sampled_reverses(rng):
    n, deg, extra = 48, 4, 6
    g = jnp.asarray(rng.integers(0, n, size=(n, deg)).astype(np.int32))
    out = add_reverse_edges(jax.random.PRNGKey(7), g, n, extra)
    out = np.asarray(out)
    assert out.shape == (n, deg + extra)
    np.testing.assert_array_equal(out[:, :deg], np.asarray(g))
    gnp = np.asarray(g)
    for v in range(n):
        for u in out[v, deg:]:
            if u == n:
                continue
            assert v in gnp[u]


def test_leaf_join_merge_exact_within_leaf(rng):
    """Members of one leaf must end up with their exact in-leaf kNN (the
    join is all-pairs; partition passes rely on this being lossless)."""
    from annsearch_tpu.ops.graph import leaf_join_merge, random_init_graph

    x, xp, sq = _padded(rng, n=192, d=8)
    n, kk = 192, 5
    ids, dists = random_init_graph(jax.random.PRNGKey(0), xp, sq, kk,
                                   Dist.EUCLIDEAN)
    # one partition of 3 leaves x 64 (plus a padded leaf of sentinels)
    perm = rng.permutation(n).astype(np.int32)
    leaves = np.concatenate([perm, np.full(64, n, np.int32)]).reshape(4, 64)
    gi, gd = leaf_join_merge(
        jnp.asarray(leaves), xp, sq, ids, dists, kk, Dist.EUCLIDEAN
    )
    gi, gd = np.asarray(gi), np.asarray(gd)
    dm = ((x[:, None, :] - x[None]) ** 2).sum(-1)
    np.fill_diagonal(dm, np.inf)
    for lv in leaves[:3]:
        for u in lv:
            in_leaf = [v for v in lv if v != u]
            want = sorted(in_leaf, key=lambda v: dm[u, v])[:kk]
            got = set(gi[u])
            # every exact in-leaf neighbour clearly closer than the worst
            # kept edge must be present (1e-3 margin: the join computes
            # hi/lo-split HIGH-grade distances, ~1e-4 abs at this scale)
            for w in want:
                if dm[u, w] <= gd[u].max() - 1e-3:
                    assert w in got, (u, w)


def test_kmeans_leaves_partition_properties(rng):
    """Every real point appears exactly once; pads fill the tail."""
    from annsearch_tpu.ops.graph import kmeans_leaves

    x, xp, sq = _padded(rng, n=300, d=8)
    cents = jnp.asarray(rng.standard_normal((10, 8)).astype(np.float32))
    for jth in (0, 1):
        leaves = np.asarray(kmeans_leaves(
            jax.random.PRNGKey(3), xp, cents, jth, 32, Dist.EUCLIDEAN,
            tile=128,
        ))
        real = leaves[leaves < 300]
        assert sorted(real.tolist()) == list(range(300))
        assert leaves.size == 320  # padded to a whole number of leaves


def test_kmeans_leaves_groups_by_cell(rng):
    """Points of one tight cluster land contiguously (same leaf when the
    leaf is big enough to hold the cluster)."""
    from annsearch_tpu.ops.graph import kmeans_leaves

    centers = rng.standard_normal((4, 8)).astype(np.float32) * 50
    pts = np.concatenate(
        [centers[i] + 0.01 * rng.standard_normal((16, 8)).astype(np.float32)
         for i in range(4)]
    )
    perm = rng.permutation(64)
    pts = pts[perm]
    owner = np.repeat(np.arange(4), 16)[perm]
    xp = jnp.concatenate([jnp.asarray(pts), jnp.zeros((1, 8))])
    leaves = np.asarray(kmeans_leaves(
        jax.random.PRNGKey(1), xp, jnp.asarray(centers), 0, 16,
        Dist.EUCLIDEAN, tile=64,
    ))
    for lv in leaves:
        own = {int(owner[m]) for m in lv if m < 64}
        assert len(own) == 1  # one cluster per leaf


def test_nnd_round_chunked_matches_single_dispatch():
    """Row-chunked rounds must be bit-identical to the one-dispatch round:
    every chunk expands from the round-start snapshot and merges only its
    own rows (the semantics the single lax.map already has)."""
    from annsearch_tpu.ops.graph import (
        nnd_round, nnd_round_chunked, random_init_graph,
    )

    n, d, kk = 3000, 16, 8
    vecs = jax.random.normal(jax.random.key(0), (n + 1, d), jnp.float32)
    sq = sq_norms(vecs)
    ids, dists = random_init_graph(
        jax.random.key(1), vecs, sq, kk, Dist.EUCLIDEAN
    )
    flags = jnp.ones((n, kk), bool)
    c_act = (kk + 16) * kk
    a = nnd_round(
        jax.random.key(2), vecs, sq, ids, dists, kk, Dist.EUCLIDEAN,
        tile=256, new_in=flags, c_active=c_act,
    )
    # 1024-row chunks with a ragged tail (3000 % 1024 != 0)
    b = nnd_round_chunked(
        jax.random.key(2), vecs, sq, ids, dists, kk, Dist.EUCLIDEAN,
        tile=256, new_in=flags, c_active=c_act, row_chunk=1024,
    )
    assert bool(jnp.all(a[0] == b[0]))           # ids
    assert bool(jnp.allclose(a[1], b[1]))        # dists
    assert int(a[2]) == int(b[2])                # update count
    assert bool(jnp.all(a[3] == b[3]))           # new-edge flags
    assert int(a[2]) > 0                         # the round did something


def test_nnd_round_chunked_inplace_improves(monkeypatch):
    """Gauss-Seidel (in-place) chunked rounds — the ≥8M memory path —
    must improve the graph like Jacobi rounds do (later chunks seeing
    earlier updates is standard async NN-descent)."""
    from annsearch_tpu.ops import graph as og

    monkeypatch.setattr(og, "NND_INPLACE_MIN_N", 1000)
    n, d, kk = 3000, 16, 8
    vecs = jax.random.normal(jax.random.key(0), (n + 1, d), jnp.float32)
    vecs = vecs.at[n].set(0.0)
    sq = jnp.sum(vecs * vecs, axis=1)
    ids, dists = og.random_init_graph(
        jax.random.key(1), vecs, sq, kk, Dist.EUCLIDEAN
    )
    before = float(jnp.mean(dists[jnp.isfinite(dists)]))
    flags = jnp.ones((n, kk), bool)
    for r in range(3):
        ids, dists, upd, flags = og.nnd_round_chunked(
            jax.random.key(2 + r), vecs, sq, ids, dists, kk,
            Dist.EUCLIDEAN, tile=256, new_in=flags,
            c_active=(kk + 24) * kk, row_chunk=1024,
        )
    after = float(jnp.mean(dists[jnp.isfinite(dists)]))
    assert after < before
    assert ids.shape == (n, kk) and dists.shape == (n, kk)
    assert int(upd) > 0
