"""Sharded query tests on the virtual 8-device CPU mesh (reference analogue:
GPU kernels tested on cubecl's CpuRuntime, ivf_gpu.rs:853-947)."""

import numpy as np
import jax

from annsearch_tpu.parallel.mesh import make_mesh
from annsearch_tpu.parallel.sharded import (
    BatchShardedExhaustive,
    ShardedExhaustive,
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_exhaustive_matches_brute(rng):
    x = rng.standard_normal((200, 16)).astype(np.float32)  # not divisible by 8? 200/8=25 ok
    q = rng.standard_normal((9, 16)).astype(np.float32)
    mesh = make_mesh(8)
    index = ShardedExhaustive(x, "euclidean", mesh=mesh)
    idx, dist = index.query(q, 7, db_chunk=32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    expect = np.sort(full, axis=1)[:, :7]
    np.testing.assert_allclose(dist, expect, rtol=1e-3, atol=1e-3)
    assert (idx < 200).all()


def test_sharded_with_padding(rng):
    # n=77 not divisible by 8 → padded rows must never appear in results
    x = rng.standard_normal((77, 8)).astype(np.float32)
    q = x[:5]
    mesh = make_mesh(8)
    index = ShardedExhaustive(x, "euclidean", mesh=mesh)
    idx, dist = index.query(q, 10, db_chunk=16)
    assert (idx < 77).all()
    np.testing.assert_allclose(dist[:, 0], np.zeros(5), atol=1e-4)
    np.testing.assert_array_equal(idx[:, 0], np.arange(5))


def test_batch_sharded_matches_brute(rng):
    # queries sharded, DB replicated — results identical to brute force,
    # uneven query count exercises the batch padding
    x = rng.standard_normal((150, 16)).astype(np.float32)
    q = rng.standard_normal((13, 16)).astype(np.float32)
    mesh = make_mesh(8)
    index = BatchShardedExhaustive(x, "euclidean", mesh=mesh)
    idx, dist = index.query(q, 7, db_chunk=32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    expect_i = np.argsort(full, axis=1)[:, :7]
    expect_d = np.sort(full, axis=1)[:, :7]
    np.testing.assert_allclose(dist, expect_d, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(idx, expect_i)


def test_sharded_cosine(rng):
    x = rng.standard_normal((64, 8)).astype(np.float32)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    mesh = make_mesh(4)
    index = ShardedExhaustive(x, "cosine", mesh=mesh)
    idx, dist = index.query(q, 5, db_chunk=16)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    full = 1.0 - qn @ xn.T
    expect = np.sort(full, axis=1)[:, :5]
    np.testing.assert_allclose(dist, expect, rtol=1e-3, atol=1e-4)


def test_grid_sharded_matches_brute(rng):
    """2-D (batch, db) mesh: 4-way batch dp × 2-way db sharding."""
    from annsearch_tpu.parallel.mesh import make_mesh2d
    from annsearch_tpu.parallel.sharded import GridShardedExhaustive
    from annsearch_tpu.models.exhaustive import ExhaustiveIndex

    x = rng.standard_normal((1003, 16)).astype(np.float32)
    q = rng.standard_normal((37, 16)).astype(np.float32)  # pads to 40
    mesh = make_mesh2d(4, 2)
    grid = GridShardedExhaustive(x, "euclidean", mesh=mesh)
    gi, gd = grid.query(q, 7)
    exact = ExhaustiveIndex(x)
    ei, ed = exact.query(q, 7)
    np.testing.assert_array_equal(gi, ei)
    np.testing.assert_allclose(gd, ed, rtol=1e-4, atol=1e-4)


def test_grid_sharded_cosine(rng):
    from annsearch_tpu.parallel.mesh import make_mesh2d
    from annsearch_tpu.parallel.sharded import GridShardedExhaustive
    from annsearch_tpu.models.exhaustive import ExhaustiveIndex

    x = rng.standard_normal((640, 12)).astype(np.float32)
    q = rng.standard_normal((24, 12)).astype(np.float32)
    grid = GridShardedExhaustive(x, "cosine", mesh=make_mesh2d(2, 4))
    gi, gd = grid.query(q, 5)
    exact = ExhaustiveIndex(x, "cosine")
    ei, ed = exact.query(q, 5)
    np.testing.assert_array_equal(gi, ei)
    np.testing.assert_allclose(gd, ed, rtol=1e-3, atol=1e-4)
