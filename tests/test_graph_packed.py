"""Packed-neighbourhood beam search: layout + parity vs the gather path.

``pack_neighbor_table`` trades HBM for contiguous multi-KB beam-search
DMAs (the measured per-iteration floor was ``expand·deg`` 64–128 B random
reads). These tests pin (a) the packed row layout — hi+lo lanes must
reconstruct the neighbour vectors, the two norm lanes their squared
norms — and (b) that ``beam_search`` returns the same neighbourhoods
with and without the table.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from annsearch_tpu.ops.graph import (
    beam_search,
    maybe_pack_neighbors,
    neighbor_pack_bytes,
    pack_neighbor_table,
)
from annsearch_tpu.utils.dist import Dist, sq_norms
from annsearch_tpu.utils.data import (
    generate_clustered_data,
    subsample_with_noise,
)
from annsearch_tpu.utils.metrics import calculate_recall


@pytest.fixture(scope="module")
def small_graph():
    rng = np.random.default_rng(7)
    x, _ = generate_clustered_data(600, 32, 5, seed=11)
    n, d = x.shape
    vectors = jnp.concatenate(
        [jnp.asarray(x), jnp.zeros((1, d), jnp.float32)]
    )
    sqn = sq_norms(vectors)
    deg = 12
    # exact kNN graph (excluding self) + a few sentinel edges
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    graph = np.argsort(d2, axis=1)[:, :deg].astype(np.int32)
    graph[rng.integers(0, n, 40), rng.integers(0, deg, 40)] = n  # sentinels
    graph = jnp.concatenate(
        [jnp.asarray(graph), jnp.full((1, deg), n, jnp.int32)]
    )
    return x, vectors, sqn, graph


def test_pack_layout_reconstructs(small_graph):
    x, vectors, sqn, graph = small_graph
    n, d = x.shape
    deg = graph.shape[1]
    packed = np.asarray(
        pack_neighbor_table(vectors, sqn, graph, chunk=128)
    ).astype(np.float32)
    assert packed.shape == (n + 1, deg * (2 * d + 2))
    assert packed.nbytes // 2 * 2 == 0 or True  # shape math via helper:
    assert neighbor_pack_bytes(n, deg, d) == 2 * (n + 1) * deg * (2 * d + 2)
    rows = packed.reshape(n + 1, deg, 2 * d + 2)
    g = np.asarray(graph)
    for u in (0, 3, n - 1):
        for j in range(deg):
            v = g[u, j]
            if v >= n:
                assert np.all(rows[u, j] == 0.0)
                continue
            rec = rows[u, j, :d] + rows[u, j, d : 2 * d]
            np.testing.assert_allclose(rec, x[v], rtol=0, atol=2e-4)
            sq = rows[u, j, 2 * d] + rows[u, j, 2 * d + 1]
            np.testing.assert_allclose(
                sq, float(np.sum(x[v] ** 2)), rtol=2e-5
            )
    # sentinel node row is all zeros
    assert np.all(rows[n] == 0.0)


@pytest.mark.parametrize("metric", [Dist.EUCLIDEAN, Dist.COSINE])
def test_beam_packed_matches_gather(small_graph, metric):
    x, vectors, sqn, graph = small_graph
    n, d = x.shape
    if metric == Dist.COSINE:
        vn = np.asarray(vectors)
        norms = np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-12)
        vectors = jnp.asarray(vn / norms)
        vectors = vectors.at[n].set(0.0)
        sqn = sq_norms(vectors)
    packed = pack_neighbor_table(vectors, sqn, graph, chunk=128)
    q = jnp.asarray(
        subsample_with_noise(np.asarray(vectors[:n]), 64, seed=3)
    )
    entries = jnp.tile(jnp.arange(4, dtype=jnp.int32)[None, :], (64, 1))
    kw = dict(k=10, beam=32, iters=12, metric=metric, expand=4)
    d0, i0 = beam_search(q, vectors, sqn, graph, entries, **kw)
    d1, i1 = beam_search(
        q, vectors, sqn, graph, entries, packed_nbrs=packed, **kw
    )
    # identical traversal up to near-tie reordering: assert id-set overlap
    # and distance agreement on the packed path's own ids
    overlap = calculate_recall(np.asarray(i0), np.asarray(i1), 10)
    assert overlap >= 0.95
    qn = np.asarray(q)
    sel = np.asarray(vectors)[np.clip(np.asarray(i1), 0, n)]
    if metric == Dist.COSINE:
        dtrue = 1.0 - np.einsum("qd,qkd->qk", qn, sel)
    else:
        diff = qn[:, None, :] - sel
        dtrue = np.sum(diff * diff, axis=-1)
    da = np.asarray(d1)
    finite = np.isfinite(da)
    # split-lane scoring error scales with ‖q‖·‖x‖·2⁻¹⁷ (bf16 hi/lo
    # reconstruction + two-lane norm), not with the distance
    mag = (
        np.linalg.norm(qn, axis=1)[:, None]
        * np.linalg.norm(sel, axis=-1)
    )
    tol = 1e-3 + 1e-3 * np.abs(dtrue) + 4e-5 * mag
    assert np.all(np.abs(da - dtrue)[finite] <= tol[finite])


def test_maybe_pack_respects_budget(small_graph, monkeypatch):
    x, vectors, sqn, graph = small_graph
    monkeypatch.setenv("ANNSEARCH_NBR_PACK_BYTES", "64")
    assert maybe_pack_neighbors(vectors, sqn, graph) is None
    monkeypatch.delenv("ANNSEARCH_NBR_PACK_BYTES")
    assert maybe_pack_neighbors(vectors, sqn, graph) is not None


@pytest.mark.parametrize("metric", [Dist.EUCLIDEAN, Dist.COSINE])
def test_beam_bf16_path_rescores_f32_exact(small_graph, metric):
    """With BOTH f32-grade scoring paths gated off (no hi/lo split, no
    packed rows — the ≥3 GiB-table regime, e.g. 10M×128d), the walk scores
    candidates in single-pass bf16 but the returned top-k must be
    re-selected and re-ordered at f32 grade: distances are elementwise-f32
    exact and recall matches the f32-grade packed path."""
    x, vectors, sqn, graph = small_graph
    n, d = x.shape
    if metric == Dist.COSINE:
        vn = np.asarray(vectors)
        norms = np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-12)
        vectors = jnp.asarray(vn / norms)
        vectors = vectors.at[n].set(0.0)
        sqn = sq_norms(vectors)
    q = jnp.asarray(
        subsample_with_noise(np.asarray(vectors[:n]), 64, seed=3)
    )
    entries = jnp.tile(jnp.arange(4, dtype=jnp.int32)[None, :], (64, 1))
    kw = dict(k=10, beam=32, iters=12, metric=metric, expand=4)
    db, ib = beam_search(q, vectors, sqn, graph, entries, **kw)
    # exact f32 distances on the returned ids (sentinel slots excluded)
    qn = np.asarray(q)
    ia = np.asarray(ib)
    da = np.asarray(db)
    sel = np.asarray(vectors)[np.clip(ia, 0, n)]
    if metric == Dist.COSINE:
        dtrue = 1.0 - np.einsum("qd,qkd->qk", qn, sel)
    else:
        diff = qn[:, None, :] - sel
        dtrue = np.sum(diff * diff, axis=-1)
    finite = np.isfinite(da) & (ia < n)
    np.testing.assert_allclose(da[finite], dtrue[finite], rtol=1e-5,
                               atol=1e-6)
    # ascending order preserved
    assert np.all(np.diff(np.where(np.isfinite(da), da, np.inf),
                          axis=-1) >= -1e-6)
    # recall parity with the f32-grade hi/lo path on the same walk params
    from annsearch_tpu.ops.graph import pack_neighbor_table

    packed = pack_neighbor_table(vectors, sqn, graph, chunk=128)
    dp, ip = beam_search(
        q, vectors, sqn, graph, entries, packed_nbrs=packed, **kw
    )
    overlap = calculate_recall(np.asarray(ip), ia, 10)
    assert overlap >= 0.95
