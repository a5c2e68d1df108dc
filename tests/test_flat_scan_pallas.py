"""Fused Pallas flat scan: parity against the exact blocked scan."""

import jax
import numpy as np
import pytest

from annsearch_tpu.ops.flat_scan_pallas import flat_topk_fused
from annsearch_tpu.ops.topk import blocked_query_topk
from annsearch_tpu.utils.dist import Dist, normalise
from annsearch_tpu.utils.data import generate_clustered_data
from annsearch_tpu.utils.metrics import calculate_recall

import jax.numpy as jnp


@pytest.fixture(scope="module")
def data():
    x, _ = generate_clustered_data(700, 32, 5, seed=7)
    q = x[:50] + 0.01
    return jnp.asarray(x), jnp.asarray(q)


@pytest.mark.parametrize("metric", [Dist.EUCLIDEAN, Dist.COSINE])
@pytest.mark.parametrize("passes,depth", [(6, 2), (3, 2), (1, 1)])
def test_flat_fused_parity(data, metric, passes, depth):
    x, q = data
    if metric == Dist.COSINE:
        x = normalise(x)
        q = normalise(q)
    de, ie = blocked_query_topk(q, x, 10, metric)
    df, i_f = flat_topk_fused(
        x=x, q=q, k=10, metric=metric, passes=passes, depth=depth,
        block_q=32, block_db=128, interpret=True,
    )
    rec = calculate_recall(np.asarray(ie), np.asarray(i_f), 10)
    assert rec >= (0.99 if passes >= 3 else 0.9)
    if passes >= 3:
        # bf16x3 ≈ f32 but not bitwise: near-zero distances carry absolute
        # error ~‖q‖‖x‖·2⁻²⁴-ish from the split residual
        assert np.allclose(
            np.asarray(de), np.asarray(df), rtol=1e-3, atol=1e-2
        )
    # ascending order
    assert np.all(np.diff(np.asarray(df), axis=-1) >= -1e-6)


def test_flat_fused_n_valid_and_small_n():
    x, _ = generate_clustered_data(150, 32, 3, seed=8)
    x = jnp.asarray(x)
    d, i = flat_topk_fused(
        x=x, q=x[:10], k=5, metric=Dist.EUCLIDEAN, n_valid=100,
        passes=3, block_q=16, block_db=128, interpret=True,
    )
    assert np.asarray(i).max() < 100
    de, ie = blocked_query_topk(x[:10], x[:100], 5, Dist.EUCLIDEAN)
    assert calculate_recall(np.asarray(ie), np.asarray(i), 5) >= 0.99


def test_flat_fused_k_exceeds_candidates():
    x = jnp.asarray(np.random.RandomState(0).randn(40, 32).astype(np.float32))
    d, i = flat_topk_fused(
        x=x, q=x[:4], k=20, metric=Dist.EUCLIDEAN,
        passes=3, block_q=8, block_db=128, interpret=True,
    )
    assert d.shape == (4, 20)
    assert np.all(np.isfinite(np.asarray(d)[:, :20]) | (np.asarray(d) == np.inf))
