"""Sharded paths at realistic shapes (VERDICT r4 next-round #7).

The toy-shape sharded tests (≤ 2k rows, 16–32d) exercise semantics; these
exercise the padding/probe-block/skew machinery at sizes where uneven cell
occupancy and batch-grid padding actually bite: 64k×64d for the 2-D
(batch, db) grids, 32k for the beam-ring self-kNN. Mirrors the reference's
habit of running GPU logic on the CPU runtime at real sizes
(``src/gpu/ivf_gpu.rs:853-947``). Marked slow — each case is tens of
seconds of CPU-mesh work.
"""

import numpy as np
import pytest

from annsearch_tpu.models.exhaustive import ExhaustiveIndex
from annsearch_tpu.parallel.ivf_sharded import (
    ShardedIvfIndex,
    ShardedIvfPqIndex,
)
from annsearch_tpu.parallel.graph_sharded import ShardedGraphIndex
from annsearch_tpu.parallel.mesh import make_mesh, make_mesh2d
from annsearch_tpu.utils.data import (
    generate_clustered_data,
    subsample_with_noise,
)
from annsearch_tpu.utils.metrics import calculate_recall

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def big():
    x, _ = generate_clustered_data(65_000, 64, 50, seed=11)
    q = subsample_with_noise(x, 300, seed=11)
    ti, _ = ExhaustiveIndex(x, "euclidean").query(q, 10)
    return x, q, ti


def test_sharded_ivf_grid_query_parity_64k(big):
    """(2, 4) grid IVF at 64k×64d: recall vs exact GT must match the
    single-device IvfIndex at the same operating point (same nlist/seed,
    so routing and cells agree up to shard layout)."""
    from annsearch_tpu.models.ivf import IvfIndex

    x, q, ti = big
    nlist, npb = 128, 24
    single = IvfIndex(x, "euclidean", nlist=nlist, seed=0)
    si, _ = single.query(q, 10, nprobe=npb, approx=True)
    rec_single = calculate_recall(ti, si, 10)

    grid = make_mesh2d(2, 4)
    index = ShardedIvfIndex(x, "euclidean", nlist=nlist, seed=0, mesh=grid)
    gi, gd = index.query(q, 10, nprobe=npb)
    rec_grid = calculate_recall(ti, gi, 10)
    assert rec_single > 0.9, rec_single
    # the sharded scan is exact within probed cells like the single-device
    # one; any big gap means padding/skew bugs in the grid path
    assert rec_grid >= rec_single - 0.02, (rec_grid, rec_single)
    assert (np.diff(np.where(np.isinf(gd), 1e30, gd), axis=1) >= -1e-5).all()


def test_sharded_ivfpq_grid_query_64k(big):
    """(2, 4) grid IVF-PQ (the flagship index) at 64k×64d."""
    x, q, ti = big
    grid = make_mesh2d(2, 4)
    index = ShardedIvfPqIndex(
        x, "euclidean", nlist=128, seed=0, mesh=grid
    )
    gi, _ = index.query(q, 10, nprobe=24)
    rec = calculate_recall(ti, gi, 10)
    assert rec > 0.85, rec


def test_sharded_graph_grid_query_64k(big):
    """(2, 4) grid graph query at 64k×64d: routed-entry beam search over
    db shards with the batch axis sharded too."""
    x, q, ti = big
    grid = make_mesh2d(2, 4)
    index = ShardedGraphIndex(x, "euclidean", k=16, mesh=grid)
    gi, _ = index.query(q, 10)
    rec = calculate_recall(ti, gi, 10)
    assert rec > 0.9, rec


def test_sharded_graph_beam_ring_self_knn_32k():
    """Beam-ring self-kNN at 32k rows: every travelling block visits every
    sub-graph; sampled recall vs an exact scan must stay high."""
    x, _ = generate_clustered_data(32_000, 32, 30, seed=12)
    mesh = make_mesh(8)
    index = ShardedGraphIndex(x, "euclidean", k=10, mesh=mesh)
    ids, dists = index.generate_knn(8, mode="graph", flop_budget=1)
    assert ids.shape == (32_000, 8)
    rng = np.random.default_rng(0)
    sample = rng.choice(32_000, 1_500, replace=False)
    d2 = ((x[sample][:, None, :] - x[None]) ** 2).sum(-1)
    d2[np.arange(len(sample)), sample] = np.inf
    gt = np.argsort(d2, axis=1)[:, :8]
    recall = np.mean([
        len(set(ids[s]) & set(gt[i])) / 8 for i, s in enumerate(sample)
    ])
    assert recall > 0.9, recall
    assert not (ids == np.arange(32_000)[:, None]).any()
