"""Quantiser unit tests (reference pattern: quantisers.rs tests — encode/
decode round-trips, scale handling, OPQ rotation orthogonality)."""

import numpy as np
import jax.numpy as jnp

from annsearch_tpu.models.quantised.quantisers import (
    OptimisedProductQuantiser,
    ProductQuantiser,
    ScalarQuantiser,
    bf16_decode,
    bf16_encode,
)
from annsearch_tpu.utils.data import generate_clustered_data


def test_bf16_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((10, 8)).astype(np.float32))
    y = bf16_decode(bf16_encode(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-2)


def test_sq8_scales():
    x = jnp.asarray(
        np.array([[1.0, -4.0], [2.0, 2.0], [-0.5, 0.0]], dtype=np.float32)
    )
    q = ScalarQuantiser.train(x)
    np.testing.assert_allclose(np.asarray(q.scales), [2.0 / 128, 4.0 / 128], rtol=1e-6)


def test_sq8_zero_dim_scale_one():
    x = jnp.zeros((5, 3), jnp.float32)
    q = ScalarQuantiser.train(x)
    np.testing.assert_allclose(np.asarray(q.scales), np.ones(3))


def test_sq8_roundtrip(rng):
    x = jnp.asarray((rng.standard_normal((100, 16)) * 5).astype(np.float32))
    q = ScalarQuantiser.train(x)
    codes = q.encode(x)
    assert codes.dtype == jnp.int8
    y = q.decode(codes)
    # max error per dim is one quantisation step = scale
    err = np.abs(np.asarray(y) - np.asarray(x))
    assert (err <= np.asarray(q.scales)[None, :] * 1.01).all()


def test_pq_encode_decode(rng):
    x, _ = generate_clustered_data(2000, 32, 5, seed=0)
    pq = ProductQuantiser.train(jnp.asarray(x), m=8, seed=0, max_iters=8)
    codes = pq.encode(jnp.asarray(x))
    assert codes.shape == (2000, 8) and codes.dtype == jnp.uint8
    y = np.asarray(pq.decode(codes))
    # quantisation error well below data scale
    rel = np.linalg.norm(y - x) / np.linalg.norm(x)
    assert rel < 0.25, rel


def test_pq_code_sqnorms_match_decode(rng):
    x, _ = generate_clustered_data(500, 32, 4, seed=1)
    pq = ProductQuantiser.train(jnp.asarray(x), m=8, seed=0, max_iters=5)
    codes = pq.encode(jnp.asarray(x))
    sn = np.asarray(pq.code_sqnorms(codes))
    dec = np.asarray(pq.decode(codes))
    np.testing.assert_allclose(sn, (dec**2).sum(-1), rtol=1e-4)


def test_pq_rejects_bad_m():
    x = jnp.zeros((10, 33), jnp.float32)
    try:
        ProductQuantiser.train(x, m=8)
        assert False
    except ValueError:
        pass


def test_opq_rotation_orthogonal():
    x, _ = generate_clustered_data(1500, 32, 5, seed=2)
    opq = OptimisedProductQuantiser.train(jnp.asarray(x), m=8, seed=0, max_iters=5)
    r = np.asarray(opq.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(32), atol=1e-4)


def test_opq_not_worse_than_pq():
    # correlated data is where OPQ should win (or at least tie)
    from annsearch_tpu.utils.data import generate_clustered_data_high_dim

    x, _ = generate_clustered_data_high_dim(2000, 32, 4, seed=3)
    xj = jnp.asarray(x)
    pq = ProductQuantiser.train(xj, m=8, seed=0, max_iters=8)
    opq = OptimisedProductQuantiser.train(xj, m=8, seed=0, max_iters=8)
    e_pq = np.linalg.norm(np.asarray(pq.decode(pq.encode(xj))) - x)
    e_opq = np.linalg.norm(np.asarray(opq.decode(opq.encode(xj))) - x)
    assert e_opq < e_pq * 1.1


def test_sq8_round_half_away_hand_fixture():
    """Reference encode semantics (quantisers.rs:152-163): round half AWAY
    from zero, then clamp."""
    from annsearch_tpu.models.quantised.quantisers import ScalarQuantiser

    sq = ScalarQuantiser(jnp.ones((4,), jnp.float32))
    x = jnp.asarray([[0.5, -0.5, 1.4, -127.5],
                     [2.5, -2.5, 200.0, -200.0]], jnp.float32)
    codes = np.asarray(sq.encode(x))
    np.testing.assert_array_equal(codes[0], [1, -1, 1, -128])
    np.testing.assert_array_equal(codes[1], [3, -3, 127, -128])


def test_pq_encode_picks_nearest_codeword(rng):
    """Every emitted code must be the argmin codeword of its subspace."""
    from annsearch_tpu.models.quantised.quantisers import ProductQuantiser

    x = jnp.asarray(rng.standard_normal((400, 32)).astype(np.float32))
    pq = ProductQuantiser.train(x, m=4, seed=0)
    codes = np.asarray(pq.encode(x[:50]))
    cb = np.asarray(pq.codebooks)  # [m, 256, ds]
    xs = np.asarray(x[:50]).reshape(50, 4, 8)
    for s in range(4):
        d = ((xs[:, s, None, :] - cb[s][None]) ** 2).sum(-1)  # [50, 256]
        np.testing.assert_array_equal(codes[:, s], d.argmin(1))


def test_bf16_relative_error_bound(rng):
    from annsearch_tpu.models.quantised.quantisers import bf16_decode, bf16_encode

    x = jnp.asarray((rng.standard_normal((200, 16)) * 100).astype(np.float32))
    err = np.abs(np.asarray(bf16_decode(bf16_encode(x))) - np.asarray(x))
    rel = err / np.maximum(np.abs(np.asarray(x)), 1e-12)
    assert rel.max() < 2 ** -8  # bf16 has 8 mantissa bits incl. implicit


def test_opq_encode_decode_roundtrip_consistent(rng):
    """decode(encode(x)) must live in the ORIGINAL space (rotation undone):
    reconstruction correlates with x, and error matches the PQ error on the
    rotated data."""
    from annsearch_tpu.models.quantised.quantisers import (
        OptimisedProductQuantiser,
    )

    x = jnp.asarray(rng.standard_normal((500, 32)).astype(np.float32))
    opq = OptimisedProductQuantiser.train(x, m=8, seed=0)
    rec = np.asarray(opq.decode(opq.encode(x[:100])))
    xx = np.asarray(x[:100])
    base = (xx ** 2).sum()
    err = ((rec - xx) ** 2).sum()
    assert err < 0.8 * base  # reconstruction genuinely tracks the input
