"""Fused Pallas flat-scan top-k (exhaustive / self-kNN path).

The XLA running-bins scan (``ops/topk.chunked_topk_bins``) is the fastest
XLA formulation — matmul + elementwise min-updates, no per-tile sort — but
its ``[bq, bins]`` carry exceeds VMEM, so XLA spills it to HBM every scan
step; the spill traffic is the measured floor of the 1M self-kNN build
(PROGRESS_NOTES #bottlenecks). This kernel keeps the bins state in VMEM
scratch across database tiles and fuses the distance epilogue into the
min-update, cutting the per-element VPU work to ~4 ops:

  grid (query_tile i, db_tile j) — j innermost, so one query tile streams
  the whole database while its bins state lives in VMEM:
    dots  = Σ over (a,b) in ``terms`` of q_part[a] · x_part[b]^T   (MXU)
    score = sn_tile − 2·dots           (rank-equivalent: ‖q‖² added at the end)
    bins[lane] = min-update (depth 1 or 2 per residue class)
    at j == last: extract kb minima → dense [QT, kb] outputs

Precision is a mantissa split (``utils/dist.mantissa_split``): ``passes=1``
is plain bf16; ``passes=3`` sums the hi/lo cross terms (≈ f32 at 15 mantissa
bits); ``passes=6`` a three-way split (≈ full f32). **Small dims ride one
matmul**: when 2·d ≤ 128 lanes the split parts are packed side-by-side into
the 128-lane contraction (q = [hi|lo|hi|0] against x = [hi|hi|lo|0] computes
hi·hi + lo·hi + hi·lo in a single MXU pass), so d=32 at passes=3 costs one
pass and one DB stream instead of three padded passes — the reference's SIMD
kernels (src/simd/dist.rs) achieve small-d efficiency with narrow lane
loads; on the MXU the analogue is filling the systolic contraction.

Selection quality matches the XLA bins scan: a true top-k entry is lost only
when > depth of the true top-k share one residue class
(P ≈ C(k, depth+1)/bins^depth).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.dist import Dist, mantissa_split, sq_norms

__all__ = ["flat_topk_fused"]

#: finite "masked" sentinel (fast-math-safe stand-in for +inf inside the
#: kernel; still ranks last in every merge). Python float — a jnp scalar
#: would be a captured constant, which pallas kernels reject.
_BIG = 3.0e38

# VMEM budget at depth 2: scratch QT·2B·8 bytes + dots QT·B·4 + double-
# buffered db blocks; B=2048 keeps the worst case (d=128, passes=3) ≈ 9 MB
_DEF_B = 2048

#: cross terms of the mantissa split summed per part count — (a, b) means
#: q_part[a] · x_part[b]; 2-way keeps hi·hi + hi·lo + lo·hi (drops lo·lo,
#: ~2⁻³⁰ relative), 3-way the six largest of nine
_CROSS = {
    1: ((0, 0),),
    2: ((0, 0), (0, 1), (1, 0)),
    3: ((0, 0), (0, 1), (1, 0), (0, 2), (2, 0), (1, 1)),
}


def _flat_kernel(
    q_refs,       # tuple of [1, QT, dp] bf16 blocks
    x_refs,       # tuple of [1, B, dp] bf16 blocks
    sn_ref,       # [1, 8, B] f32, sublane-replicated (BIG on padding rows)
    qadd_ref,     # [1, 8, QT] f32, sublane-replicated
    d_out_ref,    # [1, QT, kb] f32
    i_out_ref,    # [1, QT, kb] int32
    m_ref,        # scratch [QT, depth*B] f32
    ii_ref,       # scratch [QT, depth*B] int32
    *,
    kb: int,
    depth: int,
    terms: tuple[tuple[int, int], ...],
):
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    QT = m_ref.shape[0]
    B = sn_ref.shape[2]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, _BIG, jnp.float32)
        ii_ref[:] = jnp.zeros(ii_ref.shape, jnp.int32)

    # rows are sublane-replicated ([*, 8, W] tiles — a natively-tiled (8,128)
    # layout; a (1, W) block is a partial tile Mosaic handles poorly)
    sn_row = sn_ref[0, 0:1, :]                        # [1, B]
    qadd_row = qadd_ref[0, 0]                         # [QT]
    dn = (((1,), (1,)), ((), ()))

    def mm(a_ref, b_ref):
        return jax.lax.dot_general(
            a_ref[0], b_ref[0], dn, preferred_element_type=jnp.float32
        )

    dots = mm(q_refs[terms[0][0]], x_refs[terms[0][1]])
    for a, b in terms[1:]:
        dots = dots + mm(q_refs[a], x_refs[b])
    score = sn_row - 2.0 * dots                       # [QT, B]
    col = j * B + jax.lax.broadcasted_iota(jnp.int32, (QT, B), 1)

    m1 = m_ref[:, :B]
    b1 = score < m1
    m_ref[:, :B] = jnp.where(b1, score, m1)
    i1 = ii_ref[:, :B]
    ii_ref[:, :B] = jnp.where(b1, col, i1)
    if depth == 2:
        spill = jnp.where(b1, m1, score)
        spi = jnp.where(b1, i1, col)
        m2 = m_ref[:, B:]
        b2 = spill < m2
        m_ref[:, B:] = jnp.where(b2, spill, m2)
        ii_ref[:, B:] = jnp.where(b2, spi, ii_ref[:, B:])

    @pl.when(j == nb - 1)
    def _():
        vals = m_ref[:]
        idx = ii_ref[:]
        qadd = qadd_row
        # per-column writes (static lane index) rather than a lane-vector
        # stack; finite sentinel rather than inf (fast-math-safe)
        for t in range(kb):
            v = jnp.min(vals, axis=-1)                        # [QT]
            hit = vals == v[:, None]
            l_of_v = jnp.min(jnp.where(hit, idx, 2**30), axis=-1)
            d_out_ref[0, :, t] = v + qadd
            i_out_ref[0, :, t] = l_of_v
            vals = jnp.where(hit & (idx == l_of_v[:, None]), _BIG, vals)


def _pad_lanes(a: jax.Array, width: int) -> jax.Array:
    pad = width - a.shape[-1]
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1
    )


def _prep_parts(
    q_blocks: jax.Array, x_blocks: jax.Array, n_parts: int
) -> tuple[tuple, tuple, tuple]:
    """Mantissa-split + lane layout. Returns (q_in, x_in, terms) where
    ``terms[(a, b)]`` are the matmul pairs the kernel sums.

    When 2·d ≤ 128 the cross terms are packed into the 128-lane contraction
    dim (slot capacity s = 128 // d, ceil(n_terms / s) packed passes);
    otherwise parts are padded to a 128 multiple and each cross term is its
    own matmul over shared part blocks."""
    d = q_blocks.shape[-1]
    cross = _CROSS[n_parts]
    s = 128 // d if d <= 64 else 0
    if n_parts >= 2 and s >= 2:
        q_parts = mantissa_split(q_blocks, n_parts)
        x_parts = mantissa_split(x_blocks, n_parts)
        q_in, x_in = [], []
        for p in range(0, len(cross), s):
            chunk = cross[p:p + s]
            q_in.append(_pad_lanes(
                jnp.concatenate([q_parts[a] for a, _ in chunk], axis=-1), 128
            ))
            x_in.append(_pad_lanes(
                jnp.concatenate([x_parts[b] for _, b in chunk], axis=-1), 128
            ))
        terms = tuple((i, i) for i in range(len(q_in)))
        return tuple(q_in), tuple(x_in), terms
    # pad the contraction dim to a lane multiple: Mosaic mis-handles
    # partial-lane contractions (measured: recall 0.51 and 6× slowdown at
    # d=32 on the 1M self-kNN); zero pads change neither dots nor norms
    dp = -(-d // 128) * 128
    q_blocks = _pad_lanes(q_blocks, dp)
    x_blocks = _pad_lanes(x_blocks, dp)
    if n_parts == 1:
        return (
            (q_blocks.astype(jnp.bfloat16),),
            (x_blocks.astype(jnp.bfloat16),),
            cross,
        )
    return mantissa_split(q_blocks, n_parts), mantissa_split(
        x_blocks, n_parts
    ), cross


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "n_valid", "passes", "depth", "block_q", "block_db",
        "interpret",
    ),
)
def flat_topk_fused(
    q: jax.Array,                     # [nq, d] f32 (pre-normalised if cosine)
    x: jax.Array,                     # [n, d] f32
    k: int,
    metric: Dist,
    x_sqnorm: jax.Array | None = None,
    n_valid: int | None = None,
    passes: int = 1,
    depth: int = 2,
    block_q: int | None = None,
    block_db: int = _DEF_B,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused flat top-k: ``(dists [nq, k], indices [nq, k])`` ascending.

    Euclidean distances are squared (library convention); cosine returns
    ``1 − sim``. Padding rows (beyond ``n_valid``) never win.
    """
    nq, d = q.shape
    n = x.shape[0]
    if n_valid is None:
        n_valid = n
    kb = min(1 << (max(k, 8) - 1).bit_length(), 128)
    n_parts = 3 if passes >= 6 else (2 if passes >= 3 else 1)

    B = min(block_db, max(128, 1 << (n - 1).bit_length()))
    if block_q is None:
        # DB HBM traffic ∝ number of query tiles — prefer the largest tile
        # that keeps scratch + dots + streamed blocks within VMEM budget
        dp_est = 128 if (n_parts >= 2 and 2 * d <= 128) else -(-d // 128) * 128
        for qt_try in (512, 256, 128):
            vmem = (
                qt_try * depth * B * 8        # bins scratch (f32 + int32)
                + qt_try * B * 4              # dots tile
                + 4 * B * dp_est * 2 * n_parts  # double-buffered db blocks
            )
            if vmem <= 80 * 1024 * 1024:
                break
        block_q = qt_try
    QT = min(block_q, max(8, 1 << (nq - 1).bit_length()))
    pad_n = (-n) % B
    pad_q = (-nq) % QT

    if metric == Dist.EUCLIDEAN:
        sn = sq_norms(x) if x_sqnorm is None else x_sqnorm.astype(jnp.float32)
        qadd = sq_norms(q)
        out_shift = 0.0
    else:
        # cosine: the shared epilogue yields score = −2·dots (norm term
        # zero); rank-equivalent — rescaled to 1 − dots after extraction
        sn = jnp.zeros((n,), jnp.float32)
        qadd = jnp.zeros((nq,), jnp.float32)
        out_shift = 1.0
    # large-finite sentinel on padding / out-of-range rows keeps them out of
    # every bin (inf is avoided inside the kernel — fast-math)
    rows = jnp.arange(n, dtype=jnp.int32)
    sn = jnp.where(rows < n_valid, sn, _BIG)
    if pad_n:
        x = jnp.concatenate([x, jnp.zeros((pad_n, d), x.dtype)])
        sn = jnp.concatenate([sn, jnp.full((pad_n,), _BIG, jnp.float32)])
    if pad_q:
        q = jnp.concatenate([q, jnp.zeros((pad_q, d), q.dtype)])
        qadd = jnp.concatenate([qadd, jnp.zeros((pad_q,), jnp.float32)])

    NB = x.shape[0] // B
    QI = q.shape[0] // QT
    x_blocks = x.reshape(NB, B, d)
    # sublane-replicated rows: full (8, 128) tiles; Mosaic also requires the
    # last two block dims be (÷8, ÷128) or equal to the array dims
    sn_blocks = jnp.broadcast_to(sn.reshape(NB, 1, B), (NB, 8, B))
    q_blocks = q.reshape(QI, QT, d)
    qadd_blocks = jnp.broadcast_to(qadd.reshape(QI, 1, QT), (QI, 8, QT))

    q_in, x_in, terms = _prep_parts(q_blocks, x_blocks, n_parts)
    dp = q_in[0].shape[-1]

    q_specs = [
        pl.BlockSpec((1, QT, dp), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in q_in
    ]
    x_specs = [
        pl.BlockSpec((1, B, dp), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in x_in
    ]

    kern = functools.partial(
        lambda *refs, kb, depth, terms, nq_in, nx_in: _flat_kernel(
            refs[:nq_in], refs[nq_in:nq_in + nx_in],
            refs[nq_in + nx_in], refs[nq_in + nx_in + 1],
            refs[nq_in + nx_in + 2], refs[nq_in + nx_in + 3],
            refs[nq_in + nx_in + 4], refs[nq_in + nx_in + 5],
            kb=kb, depth=depth, terms=terms,
        ),
        kb=kb, depth=depth, terms=terms, nq_in=len(q_in), nx_in=len(x_in),
    )
    cd, ci = pl.pallas_call(
        kern,
        grid=(QI, NB),
        in_specs=q_specs + x_specs + [
            pl.BlockSpec((1, 8, B), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, QT), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, QT, kb), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, kb), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((QI, QT, kb), jnp.float32),
            jax.ShapeDtypeStruct((QI, QT, kb), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((QT, depth * B), jnp.float32),
            pltpu.VMEM((QT, depth * B), jnp.int32),
        ],
        # the default scoped-vmem limit is 16 MiB; the QT=512 bins scratch
        # alone is 16.8 MiB — raise the per-kernel limit (v5e VMEM is 128 MiB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*q_in, *x_in, sn_blocks, qadd_blocks)

    cd = cd.reshape(-1, kb)[:nq]
    if metric == Dist.EUCLIDEAN:
        cd = jnp.maximum(cd, 0.0)
    else:
        cd = cd * 0.5 + out_shift
    ci = ci.reshape(-1, kb)[:nq]
    kk = min(k, kb)
    # kernel extraction is already ascending; slice and clamp
    best_d = cd[:, :kk]
    best_i = jnp.minimum(ci[:, :kk], max(n_valid - 1, 0))
    if kk < k:
        best_d = jnp.concatenate(
            [best_d, jnp.full((nq, k - kk), jnp.inf, jnp.float32)], axis=-1
        )
        best_i = jnp.concatenate(
            [best_i, jnp.zeros((nq, k - kk), jnp.int32)], axis=-1
        )
    return best_d, best_i
