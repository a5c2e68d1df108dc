"""LSH probe-sequence internals (``models/lsh.py``).

Reference analogue: lsh.rs ``generate_probes_ranked`` (:704-757) — ranked
multi-bit flip sequences ordered by hyperplane-margin uncertainty — plus
its hash/bucket layout tests (lsh.rs has 27 unit tests, the densest file
in the reference)."""

import jax.numpy as jnp
import numpy as np

from annsearch_tpu.models.lsh import _probe_cells, _probe_patterns


def test_probe_patterns_dist1_then_dist2():
    pats = _probe_patterns(bits=4, n_probes=8)
    # 7 patterns (base hash is probe 0): 4 single-bit then 3 pairs
    assert len(pats) == 7
    assert pats[:4] == ((0,), (1,), (2,), (3,))
    assert pats[4:] == ((0, 1), (0, 2), (0, 3))


def test_probe_patterns_truncates_to_n_probes():
    pats = _probe_patterns(bits=10, n_probes=3)
    assert pats == ((0,), (1,))


def test_probe_patterns_exhausts_pairs():
    # bits=3: 3 singles + 3 pairs = 6 patterns max
    pats = _probe_patterns(bits=3, n_probes=100)
    assert len(pats) == 6
    assert set(pats) == {(0,), (1,), (2,), (0, 1), (0, 2), (1, 2)}


def _hash_np(q, proj):
    """Base hash of q under one table's projections."""
    p = q @ proj
    return int(((p > 0).astype(np.int64) * (2 ** np.arange(p.shape[-1]))).sum())


def test_probe_cells_base_hash_first(rng):
    bits, dim, T = 6, 16, 3
    q = rng.standard_normal((5, dim)).astype(np.float32)
    proj = rng.standard_normal((T, dim, bits)).astype(np.float32)
    cells = np.asarray(
        _probe_cells(jnp.asarray(q), jnp.asarray(proj), bits, 4)
    )
    assert cells.shape == (5, T * 4)
    for qi in range(5):
        for t in range(T):
            base = cells[qi, t * 4]
            assert base // (1 << bits) == t  # table offset
            assert base % (1 << bits) == _hash_np(q[qi], proj[t])


def test_probe_cells_flip_most_uncertain_bit_first(rng):
    bits, dim = 5, 8
    q = rng.standard_normal((4, dim)).astype(np.float32)
    proj = rng.standard_normal((1, dim, bits)).astype(np.float32)
    cells = np.asarray(
        _probe_cells(jnp.asarray(q), jnp.asarray(proj), bits, 2)
    )
    for qi in range(4):
        p = q[qi] @ proj[0]
        most_uncertain = int(np.argmin(np.abs(p)))
        base, probe1 = int(cells[qi, 0]), int(cells[qi, 1])
        assert probe1 == base ^ (1 << most_uncertain)


def test_probe_cells_all_probes_distinct_per_table(rng):
    bits, dim, P = 6, 12, 8
    q = rng.standard_normal((6, dim)).astype(np.float32)
    proj = rng.standard_normal((2, dim, bits)).astype(np.float32)
    cells = np.asarray(
        _probe_cells(jnp.asarray(q), jnp.asarray(proj), bits, P)
    )
    for qi in range(6):
        for t in range(2):
            tp = cells[qi, t * P:(t + 1) * P]
            assert len(set(tp.tolist())) == P
            # all probes live in table t's cell range
            assert (tp // (1 << bits) == t).all()


def test_probe_cells_dist2_flips_two_ranked_bits(rng):
    bits, dim = 4, 8
    # n_probes = bits+2 → last pattern is the first distance-2 pair (0,1)
    P = bits + 2
    q = rng.standard_normal((3, dim)).astype(np.float32)
    proj = rng.standard_normal((1, dim, bits)).astype(np.float32)
    cells = np.asarray(
        _probe_cells(jnp.asarray(q), jnp.asarray(proj), bits, P)
    )
    for qi in range(3):
        p = q[qi] @ proj[0]
        order = np.argsort(np.abs(p))
        base = int(cells[qi, 0])
        want = base ^ (1 << int(order[0])) ^ (1 << int(order[1]))
        assert int(cells[qi, P - 1]) == want
