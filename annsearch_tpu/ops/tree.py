"""Batched space-partition trees (Annoy / kd-forest / ball-tree substrate).

The reference builds its trees with recursive host-side splits and queries
them with per-query backtracking priority queues (``src/cpu/annoy.rs``,
``kd_forest.rs``, ``ball_tree.rs``). Neither maps to XLA, so both phases are
reformulated:

  * **build**: a perfectly balanced tree of depth L is a sequence of L
    sort-by-(group, score) passes — each level scores every point against
    its group's splitter (hyperplane / axis / ball axis), sorts within
    groups, and splits every group in half (median split by construction).
    All groups at a level are processed in ONE composite-key ``lax.sort``,
    and per-group splitter statistics come from equal-sized reshapes — no
    recursion, no ragged arrays.
  * **query**: batched level-by-level descent on the stored per-node
    routing data (normal·q vs threshold), one gather + compare per level;
    forests replace the reference's backtracking budget with multi-tree
    candidate unions (annoy.rs:526-642's search_k budget ≈ n_trees·leaf
    candidates here), ball trees with a beam over nodes per level.

Routing data is stored in heap layout: level l holds 2^l nodes, node g's
children are (2g, 2g+1) at level l+1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dist import Dist

__all__ = ["build_partition_forest", "PartitionTree"]

_BIG = jnp.float32(1e30)


class PartitionTree:
    """One balanced partition tree.

    Attributes:
      order:    [n_pad] int32 — point ids in leaf-contiguous order
                (ids ≥ n are padding).
      normals:  list over levels of [2^l, d] splitter normals
                (kd mode: one-hot axis vectors; ball mode: diameter axis).
      thresholds: list over levels of [2^l] median thresholds.
      centers/radii: per level [2^l, d]/[2^l] (ball mode only, else None).
      leaf:     leaf size.
    """

    def __init__(self, order, normals, thresholds, centers, radii, leaf):
        self.order = order
        self.normals = normals
        self.thresholds = thresholds
        self.centers = centers
        self.radii = radii
        self.leaf = leaf

    @property
    def n_levels(self) -> int:
        return len(self.normals)


def _group_stats(vecs_g: jax.Array, valid_g: jax.Array):
    """Mean per group with padding masked. vecs_g: [G, gs, d]."""
    w = valid_g.astype(jnp.float32)[..., None]
    s = jnp.sum(vecs_g * w, axis=1)
    c = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    return s / c


@functools.partial(jax.jit, static_argnames=("g", "gs", "mode", "n"))
def _tree_level(vectors, order, keys, g: int, gs: int, mode: str, n: int):
    """One partition level as a single compiled program (one dispatch per
    level per tree — the eager version paid ~10 device round-trips per
    level, which dominates build time on high-latency links)."""
    d = vectors.shape[1]
    pts = vectors[jnp.minimum(order, n)].reshape(g, gs, d)
    valid = (order < n).reshape(g, gs)

    if mode == "annoy":
        # two-point hyperplane with split-quality retries: the reference
        # retries up to 10 random pairs for a 5–95% balanced split
        # (annoy.rs:299-397). Our median split is balanced by construction,
        # so the retry budget buys *quality* instead: score R candidate
        # hyperplanes per group by in-group projection variance (spread ⇒
        # better separation) and keep the best.
        R = 4
        ia = jax.random.randint(keys[0], (R, g), 0, gs)
        ib = jax.random.randint(keys[1], (R, g), 0, gs)
        a = pts[jnp.arange(g)[None, :], ia]               # [R, g, d]
        b = pts[jnp.arange(g)[None, :], ib]
        cand = a - b
        nrm = jnp.linalg.norm(cand, axis=-1, keepdims=True)
        rand = jax.random.normal(keys[2], (R, g, d))
        cand = jnp.where(nrm > 1e-6, cand, rand)
        cand = cand / jnp.maximum(
            jnp.linalg.norm(cand, axis=-1, keepdims=True), 1e-12
        )
        sc = jnp.einsum("gsd,rgd->rgs", pts, cand)        # [R, g, gs]
        w = valid.astype(jnp.float32)[None]
        cnt = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
        mean = jnp.sum(sc * w, axis=-1) / cnt
        var = jnp.sum((sc - mean[..., None]) ** 2 * w, axis=-1) / cnt
        best = jnp.argmax(var, axis=0)                    # [g]
        normal = cand[best, jnp.arange(g)]
    elif mode == "kd":
        # axis sampled among the top-3 in-group-spread dims
        # (kd_forest.rs:331-424 — the random pick decorrelates the forest)
        mean = _group_stats(pts, valid)
        var = _group_stats((pts - mean[:, None, :]) ** 2, valid)
        _, top3 = jax.lax.top_k(var, min(3, d))
        pick = jax.random.randint(keys[0], (g,), 0, top3.shape[1])
        axis = top3[jnp.arange(g), pick]
        normal = jax.nn.one_hot(axis, d, dtype=jnp.float32)
    else:  # ball: approximate diameter axis (ball_tree.rs:418-541)
        mean = _group_stats(pts, valid)
        d2c = jnp.sum((pts - mean[:, None, :]) ** 2, axis=-1)
        d2c = jnp.where(valid, d2c, -1.0)
        f1 = jnp.argmax(d2c, axis=-1)
        p1 = pts[jnp.arange(g), f1]
        d2f = jnp.sum((pts - p1[:, None, :]) ** 2, axis=-1)
        d2f = jnp.where(valid, d2f, -1.0)
        f2 = jnp.argmax(d2f, axis=-1)
        p2 = pts[jnp.arange(g), f2]
        normal = p1 - p2
        nrm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
        rand = jax.random.normal(keys[2], (g, d))
        normal = jnp.where(nrm > 1e-6, normal, rand)

    score = jnp.einsum("gsd,gd->gs", pts, normal)
    score = jnp.where(valid, score, _BIG)  # padding → right half

    perm = jnp.argsort(score, axis=-1)
    new_order = jnp.take_along_axis(order.reshape(g, gs), perm, axis=-1)
    sorted_score = jnp.take_along_axis(score, perm, axis=-1)
    thr = 0.5 * (sorted_score[:, gs // 2 - 1] + sorted_score[:, gs // 2])
    thr = jnp.clip(thr, -_BIG, _BIG)

    if mode == "ball":
        center = _group_stats(pts, valid)
        dd = jnp.sum((pts - center[:, None, :]) ** 2, axis=-1)
        dd = jnp.where(valid, dd, 0.0)
        radius = jnp.sqrt(jnp.max(dd, axis=-1))
    else:
        center = radius = None
    return new_order.reshape(-1), normal, thr, center, radius


@functools.partial(jax.jit, static_argnames=("g", "leaf", "n"))
def _leaf_ball_stats(vectors, order, g: int, leaf: int, n: int):
    d = vectors.shape[1]
    pts = vectors[jnp.minimum(order, n)].reshape(g, leaf, d)
    valid = (order < n).reshape(g, leaf)
    center = _group_stats(pts, valid)
    dd = jnp.sum((pts - center[:, None, :]) ** 2, axis=-1)
    dd = jnp.where(valid, dd, 0.0)
    return center, jnp.sqrt(jnp.max(dd, axis=-1))


@functools.partial(
    jax.jit, static_argnames=("g_max", "log2_npad", "mode", "n")
)
def _tree_level_uniform(
    vectors, order, keys, lv, g_max: int, log2_npad: int, mode: str, n: int
):
    """Shape-uniform level step: every level of every tree runs this ONE
    compiled program (``lv`` is traced; group structure is derived from
    positions by shifts, per-group stats by segment ops padded to
    ``g_max``). The per-level-shape variant (`_tree_level`) paid one XLA
    compile per level — ~110 s cold forest builds on the 150k workload."""
    n_pad = order.shape[0]
    d = vectors.shape[1]
    log2_gs = jnp.int32(log2_npad) - lv            # group size = 1 << log2_gs
    gs = jnp.int32(1) << log2_gs
    pos = jnp.arange(n_pad, dtype=jnp.int32)
    gid = jax.lax.shift_right_logical(pos, log2_gs)
    starts = jnp.arange(g_max, dtype=jnp.int32) << log2_gs  # ≥ n_pad for unused

    pts = vectors[jnp.minimum(order, n)]           # [n_pad, d]
    valid = order < n
    w = valid.astype(jnp.float32)

    def seg_sum(v):
        return jax.ops.segment_sum(v, gid, num_segments=g_max)

    cnt = jnp.maximum(seg_sum(w), 1.0)             # [g_max]

    def gmean(v):                                  # [n_pad, d] → [g_max, d]
        return seg_sum(v * w[:, None]) / cnt[:, None]

    if mode == "annoy":
        # R candidate two-point hyperplanes per group, keep the max-variance
        # one (see `_tree_level` for rationale vs annoy.rs:299-397 retries)
        R = 4
        ia = jax.random.randint(keys[0], (R, g_max), 0, gs)
        ib = jax.random.randint(keys[1], (R, g_max), 0, gs)
        pa = jnp.minimum(starts[None, :] + ia, n_pad - 1)
        pb = jnp.minimum(starts[None, :] + ib, n_pad - 1)
        a = vectors[jnp.minimum(order[pa], n)]     # [R, g_max, d]
        b = vectors[jnp.minimum(order[pb], n)]
        cand = a - b
        nrm = jnp.linalg.norm(cand, axis=-1, keepdims=True)
        rand = jax.random.normal(keys[2], (R, g_max, d))
        cand = jnp.where(nrm > 1e-6, cand, rand)
        cand = cand / jnp.maximum(
            jnp.linalg.norm(cand, axis=-1, keepdims=True), 1e-12
        )
        sc = jnp.einsum("nd,rnd->rn", pts, cand[:, gid])   # [R, n_pad]
        s1 = jax.vmap(lambda v: seg_sum(v * w))(sc)        # [R, g_max]
        s2 = jax.vmap(lambda v: seg_sum(v * v * w))(sc)
        var = s2 / cnt[None] - (s1 / cnt[None]) ** 2
        best = jnp.argmax(var, axis=0)                     # [g_max]
        normal = cand[best, jnp.arange(g_max)]
    elif mode == "kd":
        mean = gmean(pts)
        var = gmean((pts - mean[gid]) ** 2)
        _, top3 = jax.lax.top_k(var, min(3, d))
        pick = jax.random.randint(keys[0], (g_max,), 0, top3.shape[1])
        axis = top3[jnp.arange(g_max), pick]
        normal = jax.nn.one_hot(axis, d, dtype=jnp.float32)
    else:  # ball: approximate diameter axis
        mean = gmean(pts)
        d2c = jnp.where(valid, jnp.sum((pts - mean[gid]) ** 2, -1), -1.0)
        m1 = jax.ops.segment_max(d2c, gid, num_segments=g_max)
        hit1 = d2c == m1[gid]
        f1 = jax.ops.segment_min(
            jnp.where(hit1, pos, n_pad), gid, num_segments=g_max
        )
        p1 = vectors[jnp.minimum(order[jnp.minimum(f1, n_pad - 1)], n)]
        d2f = jnp.where(valid, jnp.sum((pts - p1[gid]) ** 2, -1), -1.0)
        m2 = jax.ops.segment_max(d2f, gid, num_segments=g_max)
        hit2 = d2f == m2[gid]
        f2 = jax.ops.segment_min(
            jnp.where(hit2, pos, n_pad), gid, num_segments=g_max
        )
        p2 = vectors[jnp.minimum(order[jnp.minimum(f2, n_pad - 1)], n)]
        normal = p1 - p2
        nrm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
        rand = jax.random.normal(keys[2], (g_max, d))
        normal = jnp.where(nrm > 1e-6, normal, rand)

    score = jnp.einsum("nd,nd->n", pts, normal[gid])
    score = jnp.where(valid, score, _BIG)          # padding → right half

    _, sorted_score, new_order = jax.lax.sort(
        (gid, score, order), num_keys=2
    )
    half = gs >> 1
    i1 = jnp.minimum(starts + half - 1, n_pad - 1)
    i2 = jnp.minimum(starts + half, n_pad - 1)
    thr = jnp.clip(
        0.5 * (sorted_score[i1] + sorted_score[i2]), -_BIG, _BIG
    )

    if mode == "ball":
        center = gmean(pts)
        dd = jnp.where(valid, jnp.sum((pts - center[gid]) ** 2, -1), 0.0)
        radius = jnp.sqrt(
            jax.ops.segment_max(dd, gid, num_segments=g_max)
        )
    else:
        center = radius = None
    return new_order, normal, thr, center, radius


def build_partition_tree(
    key: jax.Array,
    vectors: jax.Array,   # [n+1, d] sentinel row n
    levels: int,
    leaf: int,
    mode: str,            # "annoy" | "kd" | "ball"
) -> PartitionTree:
    """Build one tree (host loop over levels; all levels share one
    compiled program when the leaf size is a power of two)."""
    n = vectors.shape[0] - 1
    n_pad = (2**levels) * leaf
    if n_pad < n:
        levels = int(np.ceil(np.log2(max(n / leaf, 1))))
        n_pad = (2**levels) * leaf

    order = jnp.concatenate(
        [
            jnp.arange(n, dtype=jnp.int32),
            jnp.full((n_pad - n,), n, jnp.int32),
        ]
    )
    normals, thresholds, centers, radii = [], [], [], []

    uniform = (leaf & (leaf - 1)) == 0 and levels >= 1
    g_max = 2 ** (levels - 1) if levels >= 1 else 1
    log2_npad = int(np.log2(n_pad)) if uniform else 0

    for lv in range(levels):
        g = 2**lv
        gs = n_pad // g
        keys = jax.random.split(jax.random.fold_in(key, lv), 3)
        if uniform:
            order, normal, thr, center, radius = _tree_level_uniform(
                vectors, order, keys, jnp.int32(lv), g_max, log2_npad,
                mode, n,
            )
            normal = normal[:g]
            thr = thr[:g]
            if mode == "ball":
                center = center[:g]
                radius = radius[:g]
        else:
            order, normal, thr, center, radius = _tree_level(
                vectors, order, keys, g, gs, mode, n
            )
        normals.append(normal)
        thresholds.append(thr)
        if mode == "ball":
            centers.append(center)
            radii.append(radius)

    if mode == "ball":
        center, radius = _leaf_ball_stats(vectors, order, 2**levels, leaf, n)
        centers.append(center)
        radii.append(radius)

    return PartitionTree(
        order,
        normals,
        thresholds,
        centers if mode == "ball" else None,
        radii if mode == "ball" else None,
        leaf,
    )


def build_partition_forest(
    key: jax.Array, vectors: jax.Array, n_trees: int, levels: int, leaf: int,
    mode: str,
) -> list[PartitionTree]:
    return [
        build_partition_tree(
            jax.random.fold_in(key, 7919 + t), vectors, levels, leaf, mode
        )
        for t in range(n_trees)
    ]


