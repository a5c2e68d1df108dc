"""Binary-code kernels: bit packing, Hamming scans, asymmetric scoring.

Replaces the reference's SIMD Hamming layer (``src/binary/dist_binary.rs`` —
AVX-512/AVX2/NEON XOR+popcount :35-219, asymmetric float×{−1,+1} dot
:303-322) with an MXU formulation: codes are unpacked per tile to ±1
bfloat16 and Hamming distance falls out of a dense matmul via

    dot±(q, x) = nbits − 2·hamming(q, x)

(products are exactly ±1 and accumulation is f32, so the integer result is
exact). For batched queries this turns the whole scan into the same
distance-matmul + running-top-k shape as every other index — one code path,
MXU-saturating, instead of per-pair popcount loops. A popcount
(``lax.population_count``) variant is kept for parity testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .topk import merge_topk

__all__ = [
    "pack_bits",
    "unpack_bits",
    "unpack_pm1",
    "hamming_popcount",
    "chunked_topk_hamming",
    "chunked_topk_asymmetric",
]

_INF = jnp.float32(jnp.inf)


def pack_bits(bits: np.ndarray | jax.Array) -> jax.Array:
    """Pack a boolean ``[n, nbits]`` matrix into ``[n, w]`` uint32 words
    (little-endian bit order within a word). nbits is padded to 32."""
    b = jnp.asarray(bits).astype(jnp.uint32)
    n, nbits = b.shape
    pad = (-nbits) % 32
    if pad:
        b = jnp.concatenate([b, jnp.zeros((n, pad), jnp.uint32)], axis=1)
    b = b.reshape(n, -1, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(codes: jax.Array, nbits: int) -> jax.Array:
    """Unpack ``[t, w]`` uint32 → ``[t, nbits]`` {0,1} uint32."""
    t, w = codes.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (codes[:, :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(t, w * 32)[:, :nbits]


def unpack_pm1(codes: jax.Array, nbits: int) -> jax.Array:
    """Unpack to ±1 bfloat16 (MXU operand)."""
    bits = unpack_bits(codes, nbits).astype(jnp.bfloat16)
    return bits * 2.0 - 1.0


def hamming_popcount(q_codes: jax.Array, x_codes: jax.Array) -> jax.Array:
    """Reference-parity Hamming via XOR+popcount: ``[bq, w] × [t, w] →
    [bq, t]`` int32. Used for testing and tiny batches."""
    x = jax.lax.population_count(q_codes[:, None, :] ^ x_codes[None, :, :])
    return jnp.sum(x.astype(jnp.int32), axis=-1)


def _pad_rows(x, multiple):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x


@functools.partial(jax.jit, static_argnames=("k", "nbits", "db_chunk"))
def chunked_topk_hamming(
    q_codes: jax.Array,   # [bq, w] uint32
    codes: jax.Array,     # [n, w] uint32
    k: int,
    nbits: int,
    n_valid,
    db_chunk: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Top-k smallest Hamming distance via the ±1 matmul identity."""
    codes = _pad_rows(codes, db_chunk)
    n_chunks = codes.shape[0] // db_chunk
    bq = q_codes.shape[0]
    q_pm = unpack_pm1(q_codes, nbits)  # [bq, nbits] bf16

    def step(carry, ci):
        base = ci * db_chunk
        xc = jax.lax.dynamic_slice_in_dim(codes, base, db_chunk, 0)
        x_pm = unpack_pm1(xc, nbits)
        dot = jax.lax.dot_general(
            q_pm, x_pm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d = (jnp.float32(nbits) - dot) * 0.5  # exact integer-valued hamming
        col = base + jax.lax.broadcasted_iota(jnp.int32, (1, db_chunk), 1)
        d = jnp.where(col < n_valid, d, _INF)
        cd, ci2 = jax.lax.top_k(-d, min(k, db_chunk))
        return merge_topk(carry[0], carry[1], -cd, base + ci2, k), None

    init = (
        jnp.full((bq, k), _INF, jnp.float32),
        jnp.zeros((bq, k), jnp.int32),
    )
    (d, i), _ = jax.lax.scan(step, init, jnp.arange(n_chunks))
    return d, i


@functools.partial(jax.jit, static_argnames=("k", "nbits", "db_chunk"))
def chunked_topk_asymmetric(
    q_proj: jax.Array,    # [bq, nbits] f32 — query in projection space
    codes: jax.Array,     # [n, w] uint32
    k: int,
    nbits: int,
    n_valid,
    db_chunk: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Asymmetric scoring: float query projections × {−1,+1} codes
    (reference asymmetric dot, dist_binary.rs:303-322). Returns negated dot
    as a distance (higher dot = closer), so output sorts ascending like every
    other kernel."""
    codes = _pad_rows(codes, db_chunk)
    n_chunks = codes.shape[0] // db_chunk
    bq = q_proj.shape[0]
    q16 = q_proj.astype(jnp.bfloat16)

    def step(carry, ci):
        base = ci * db_chunk
        xc = jax.lax.dynamic_slice_in_dim(codes, base, db_chunk, 0)
        x_pm = unpack_pm1(xc, nbits)
        dot = jax.lax.dot_general(
            q16, x_pm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d = -dot
        col = base + jax.lax.broadcasted_iota(jnp.int32, (1, db_chunk), 1)
        d = jnp.where(col < n_valid, d, _INF)
        cd, ci2 = jax.lax.top_k(-d, min(k, db_chunk))
        return merge_topk(carry[0], carry[1], -cd, base + ci2, k), None

    init = (
        jnp.full((bq, k), _INF, jnp.float32),
        jnp.zeros((bq, k), jnp.int32),
    )
    (d, i), _ = jax.lax.scan(step, init, jnp.arange(n_chunks))
    return d, i
