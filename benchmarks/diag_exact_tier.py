"""Diagnose the exact tier's residual ~1e-4 recall loss (VERDICT r3 #6).

For every (query, true-neighbour) pair the tier misses at the reference
operating point (500k×64d lowrank nl500 np22), report where the neighbour
lived: the rank of its cell in the query's centroid ordering (probe loss:
rank > nprobe) vs inside a probed cell (pool/selection loss). This picks
the fix — adaptive probe widening vs a larger rescore pool.

  python -m benchmarks.diag_exact_tier
"""

from __future__ import annotations

import argparse
import sys
import time
from collections import Counter

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

import jax.numpy as jnp

from annsearch_tpu.models.exhaustive import ExhaustiveIndex
from annsearch_tpu.models.ivf import IvfIndex
from annsearch_tpu.utils.data import generate_data
from annsearch_tpu.utils.metrics import calculate_recall


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=500_000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--nq", type=int, default=15_000)
    p.add_argument("--k", type=int, default=15)
    p.add_argument("--nlist", type=int, default=500)
    p.add_argument("--nprobe", type=int, default=22)
    args = p.parse_args(argv)

    x, _ = generate_data(
        "lowrank", args.n, args.dim, 12, seed=42, intrinsic_dim=16
    )
    rng = np.random.default_rng(0)
    qi = rng.choice(args.n, size=args.nq, replace=False)
    q = x[qi] + (0.05 * rng.standard_normal((args.nq, args.dim))).astype(
        np.float32
    )

    t0 = time.time()
    exact = ExhaustiveIndex(x, "euclidean")
    ti, td = exact.query(q, args.k)
    print(f"f32 GT {time.time() - t0:.1f}s", flush=True)
    del exact

    index = IvfIndex(x, "euclidean", nlist=args.nlist, seed=42)
    ai, _ = index.query(q, args.k, nprobe=args.nprobe)
    rec = calculate_recall(ti, ai, args.k)
    print(f"tier recall vs f32 GT: {rec:.5f}", flush=True)

    # host centroid routing: rank of each cell in each missed query's
    # centroid ordering; per-row cell from a fresh device assignment
    # (build-time assignments aren't retained)
    from annsearch_tpu.models.kmeans import assign_clusters

    cents = np.asarray(index.centroids)[: args.nlist]
    assignments, _ = assign_clusters(
        jnp.asarray(x), index.centroids, index.metric
    )
    assign = np.asarray(assignments)

    ranks = Counter()
    n_missed = 0
    examples = []
    for r in range(args.nq):
        missed = set(ti[r].tolist()) - set(ai[r].tolist())
        if not missed:
            continue
        dq = ((cents - q[r]) ** 2).sum(axis=1)
        order = np.argsort(dq)
        cell_rank = {c: i for i, c in enumerate(order)}
        for mid in missed:
            n_missed += 1
            rk = cell_rank[int(assign[mid])]
            ranks[rk] += 1
            if len(examples) < 10:
                examples.append((r, int(mid), rk))
    print(f"missed pairs: {n_missed} / {args.nq * args.k}", flush=True)
    print("cell-rank histogram of missed neighbours "
          f"(nprobe={args.nprobe}; rank >= nprobe ⇒ probe loss):", flush=True)
    for rk in sorted(ranks):
        print(f"  rank {rk}: {ranks[rk]}", flush=True)
    print(f"examples (query, neighbour, cell rank): {examples}", flush=True)


if __name__ == "__main__":
    main()
