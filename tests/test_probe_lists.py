"""Host probe-list builder invariants (``ops/ivf_scan.build_probe_lists*``).

Reference analogue: the CPU task-list construction feeding the GPU IVF
mega-kernel (ivf_gpu.rs:600-635). These pin the padding / chunking /
gather-map contract the device scan relies on, including the ``maxq_cap``
skew-chunking edge cases.
"""

import numpy as np

from annsearch_tpu.ops.ivf_scan import (
    build_probe_lists,
    build_probe_lists_from_pairs,
)


def _check_invariants(flat_q, flat_c, nlist, nq, cluster_ids, lists, gmap):
    ncl, maxq = lists.shape
    # power-of-two padded dims
    assert ncl & (ncl - 1) == 0
    assert maxq & (maxq - 1) == 0
    # every real (q, c) task appears exactly once in a row of its cluster
    tasks = {}
    for r in range(ncl):
        c = int(cluster_ids[r])
        for col in range(maxq):
            q = int(lists[r, col])
            if q == nq:
                continue
            assert c != nlist, "real query in a sentinel cluster row"
            tasks.setdefault((q, c), 0)
            tasks[(q, c)] += 1
    want = {}
    for q, c in zip(flat_q, flat_c):
        want.setdefault((int(q), int(c)), 0)
        want[(int(q), int(c))] += 1
    assert tasks == want
    # gather map lanes point back at this query's slots
    for q in range(nq):
        lanes = gmap[q][gmap[q] >= 0]
        assert len(lanes) == sum(1 for qq in flat_q if qq == q)
        for lane in lanes:
            r, col = divmod(int(lane), maxq)
            assert int(lists[r, col]) == q


def test_probe_lists_basic_round_trip():
    probes = np.array([[0, 2], [2, 1], [0, 1]], np.int64)
    nlist, nq = 4, 3
    cids, lists, gmap = build_probe_lists(probes, nlist, nq)
    flat_q = np.repeat(np.arange(nq), 2)
    flat_c = probes.reshape(-1)
    _check_invariants(flat_q, flat_c, nlist, nq, cids, lists, gmap)


def test_probe_lists_empty_pairs_sentinel():
    cids, lists, gmap = build_probe_lists_from_pairs(
        np.zeros(0, np.int32), np.zeros(0, np.int64), nlist=8, nq=5
    )
    assert (cids == 8).all()
    assert (lists == 5).all()
    assert (gmap == -1).all()


def test_probe_lists_maxq_cap_chunks_hot_cluster():
    """One hot cluster with 10 queries under cap 4 must split across
    ceil(10/4)=3 rows, all carrying the same cluster id."""
    nq = 12
    flat_q = np.arange(10, dtype=np.int32)
    flat_c = np.full(10, 3, np.int64)
    cids, lists, gmap = build_probe_lists_from_pairs(
        flat_q, flat_c, nlist=8, nq=nq, maxq_cap=4
    )
    assert lists.shape[1] <= 4
    rows_for_3 = np.nonzero(cids == 3)[0]
    assert len(rows_for_3) == -(-10 // lists.shape[1])
    _check_invariants(flat_q, flat_c, 8, nq, cids, lists, gmap)


def test_probe_lists_maxq_cap_one_query_per_row():
    """cap=1 is the extreme: every task gets its own row."""
    flat_q = np.array([0, 1, 2, 0], np.int32)
    flat_c = np.array([5, 5, 5, 6], np.int64)
    cids, lists, gmap = build_probe_lists_from_pairs(
        flat_q, flat_c, nlist=8, nq=3, maxq_cap=1
    )
    assert lists.shape[1] == 1
    assert (cids == 5).sum() == 3
    assert (cids == 6).sum() == 1
    _check_invariants(flat_q, flat_c, 8, 3, cids, lists, gmap)


def test_probe_lists_skewed_random(rng):
    """Zipf-skewed probes with a tight cap: full invariant check."""
    nq, nlist = 64, 16
    nprobe = 4
    # skew: cluster ~ min(zipf, nlist-1)
    probes = np.minimum(
        rng.zipf(1.5, size=(nq, nprobe)) - 1, nlist - 1
    ).astype(np.int64)
    cids, lists, gmap = build_probe_lists(probes, nlist, nq)
    flat_q = np.repeat(np.arange(nq), nprobe)
    _check_invariants(
        flat_q, probes.reshape(-1), nlist, nq, cids, lists, gmap
    )


def test_probe_lists_cap_default_bounds_padding():
    """Default cap = next_pow2(4x mean occupancy): a single mega-cluster
    cannot balloon the padded width for everyone."""
    nq = 256
    # 255 queries hit cluster 0; 255 singleton tasks spread over clusters
    flat_q = np.concatenate([np.arange(255), np.arange(255)]).astype(np.int32)
    flat_c = np.concatenate(
        [np.zeros(255), 1 + (np.arange(255) % 100)]
    ).astype(np.int64)
    cids, lists, gmap = build_probe_lists_from_pairs(
        flat_q, flat_c, nlist=128, nq=nq
    )
    # mean occupancy ~ 510/101 ≈ 5 → cap 32; width must be ≤ 32, not 256
    assert lists.shape[1] <= 32
    _check_invariants(flat_q, flat_c, 128, nq, cids, lists, gmap)


def test_probe_lists_small_dtypes():
    """Probe lists travel host->device per batch; small workloads must use
    uint16 payloads."""
    probes = np.array([[0], [1]], np.int64)
    cids, lists, _ = build_probe_lists(probes, nlist=4, nq=2)
    assert lists.dtype == np.uint16
    assert cids.dtype == np.uint16


def test_probe_lists_large_nq_int32():
    flat_q = np.array([0, 70000], np.int64)
    flat_c = np.array([0, 1], np.int64)
    cids, lists, gmap = build_probe_lists_from_pairs(
        flat_q, flat_c, nlist=4, nq=70001
    )
    assert lists.dtype == np.int32
    lanes = gmap[70000][gmap[70000] >= 0]
    assert len(lanes) == 1
