"""Distance kernel exactness tests (reference pattern: dist.rs tests —
hand-computed fixtures + agreement with a straightforward implementation)."""

import numpy as np
import jax.numpy as jnp

from annsearch_tpu.utils.dist import (
    Dist,
    normalise,
    pairwise_cosine,
    pairwise_sq_euclidean,
    parse_ann_dist,
    sq_norms,
)


def test_parse_ann_dist():
    assert parse_ann_dist("euclidean") == Dist.EUCLIDEAN
    assert parse_ann_dist("Cosine") == Dist.COSINE
    assert parse_ann_dist("COSINE") == Dist.COSINE
    # unknown falls back to euclidean like the reference's unwrap_or_default
    assert parse_ann_dist("manhattan") == Dist.EUCLIDEAN


def test_sq_euclidean_hand_computed():
    q = jnp.array([[0.0, 0.0], [1.0, 1.0]])
    x = jnp.array([[3.0, 4.0], [1.0, 1.0]])
    d = pairwise_sq_euclidean(q, x)
    expected = np.array([[25.0, 2.0], [13.0, 0.0]])
    np.testing.assert_allclose(np.asarray(d), expected, atol=1e-5)


def test_sq_euclidean_matches_numpy(rng):
    q = rng.standard_normal((17, 33)).astype(np.float32)
    x = rng.standard_normal((29, 33)).astype(np.float32)
    d = np.asarray(pairwise_sq_euclidean(jnp.asarray(q), jnp.asarray(x)))
    expected = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-4)


def test_cosine_matches_numpy(rng):
    q = rng.standard_normal((7, 16)).astype(np.float32)
    x = rng.standard_normal((11, 16)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    d = np.asarray(pairwise_cosine(normalise(jnp.asarray(q)), normalise(jnp.asarray(x))))
    expected = 1.0 - qn @ xn.T
    np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-5)


def test_sq_norms(rng):
    x = rng.standard_normal((5, 9)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sq_norms(jnp.asarray(x))), (x**2).sum(-1), rtol=1e-5
    )


def test_self_distance_zero(rng):
    x = rng.standard_normal((10, 8)).astype(np.float32) * 10
    d = np.asarray(pairwise_sq_euclidean(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(np.diag(d), np.zeros(10), atol=1e-3)
    assert (d >= 0).all()


def test_mantissa_split_reconstruction(rng):
    from annsearch_tpu.utils.dist import mantissa_split

    x = (rng.standard_normal((64, 32)).astype(np.float32) * 50).astype(
        np.float32
    )
    for parts, tol in ((2, 2e-4), (3, 2e-6)):
        terms = mantissa_split(jnp.asarray(x), parts)
        assert len(terms) == parts
        rec = sum(np.asarray(t).astype(np.float64) for t in terms)
        err = np.abs(rec - x.astype(np.float64))
        # relative reconstruction error bounded by the split depth
        assert (err <= tol * np.abs(x) + 1e-6).all(), err.max()
        # head term alone is only bf16-accurate — the residual terms must
        # carry real signal (this is what XLA's excess-precision pass was
        # silently zeroing before the masked split)
        lo = np.abs(np.asarray(terms[1]).astype(np.float64))
        assert lo.max() > 0


def test_cosine_zero_vector_queries(rng):
    """Zero vectors must not produce NaNs (reference guards, dist.rs)."""
    from annsearch_tpu.models.exhaustive import ExhaustiveIndex

    x = rng.standard_normal((50, 8)).astype(np.float32)
    x[7] = 0.0
    idx = ExhaustiveIndex(x, "cosine")
    q = np.zeros((2, 8), np.float32)
    i, d = idx.query(q, 5)
    assert np.isfinite(d).all()


def test_euclidean_distance_nonnegative_under_cancellation(rng):
    """‖q‖²+‖x‖²−2qx can go negative in float for near-identical rows —
    kernels must clamp (reference returns exact 0 for identical rows)."""
    from annsearch_tpu.ops.topk import chunked_topk
    from annsearch_tpu.utils.dist import Dist

    base = rng.standard_normal((1, 16)).astype(np.float32) * 100
    x = jnp.asarray(np.repeat(base, 32, axis=0))
    d, i = chunked_topk(jnp.asarray(base), x, 5, Dist.EUCLIDEAN)
    assert (np.asarray(d) >= 0).all()
    # |error| ~ eps*(norm scale): 16 dims x 100^2 => ~0.03 absolute is f32-correct
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=0.1)


def test_mantissa_split_parts_bf16_representable(rng):
    """Every split term must round-trip bf16 exactly — that's the whole
    point of the split (one bf16 matmul pass per term is lossless)."""
    from annsearch_tpu.utils.dist import mantissa_split

    x = jnp.asarray((rng.standard_normal((64, 8)) * 1000).astype(np.float32))
    for parts in (2, 3):
        for t in mantissa_split(x, parts):
            tf = np.asarray(t, dtype=np.float32)
            back = tf.astype(jnp.bfloat16).astype(np.float32)
            np.testing.assert_array_equal(tf, back)


def test_high_dim_distance_matches_numpy(rng):
    from annsearch_tpu.utils.dist import pairwise_sq_euclidean

    q = rng.standard_normal((5, 1024)).astype(np.float32)
    x = rng.standard_normal((30, 1024)).astype(np.float32)
    got = np.asarray(pairwise_sq_euclidean(jnp.asarray(q), jnp.asarray(x)))
    want = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)
