"""Forced approximate NN-descent at 1M×32d (VERDICT r2/r3 convergence row).

1M×32d sits BELOW `models/graph.BRUTE_BUILD_FLOP_BUDGET` (3.2e13 vs
2.56e14 MACs), so the normal build takes the exact MXU path. This script
zeroes the budget to force the REAL approximate pipeline (RP-forest +
k-means partition joins → rate-adaptive chunked NN-descent rounds,
reference nndescent.rs semantics) and reports sampled kNN-graph recall —
the round-2 done criterion was ≥ 0.95 at this shape; the reference's
CPU-NND converges to 0.9999 at 2.5M (benchmarks_gpu.md:1028-1037).

  python -m benchmarks.bench_nnd_forced_1m [--n 1000000] [--dim 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

import jax.numpy as jnp

from annsearch_tpu.models import graph as graph_mod
from annsearch_tpu.ops.topk import blocked_query_topk
from annsearch_tpu.utils.data import generate_clustered_data_device
from annsearch_tpu.utils.metrics import calculate_recall


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--n-clusters", type=int, default=100)
    p.add_argument("--k", type=int, default=15)
    p.add_argument("--build-k", type=int, default=32)
    p.add_argument("--sample", type=int, default=4096)
    p.add_argument("--refine", type=int, default=1)
    args = p.parse_args(argv)

    x, _ = generate_clustered_data_device(
        args.n, args.dim, args.n_clusters, seed=42
    )
    chk = float(np.asarray(jnp.sum(x[:8, :8])))
    print(f"data on device (chk {chk:.3f})", flush=True)

    saved = graph_mod.BRUTE_BUILD_FLOP_BUDGET
    graph_mod.BRUTE_BUILD_FLOP_BUDGET = 0  # force the approximate path
    try:
        t0 = time.time()
        index = graph_mod.NNDescentIndex(
            x, k=args.k, build_k=args.build_k, verbose=True,
            refine_rounds=args.refine,
        )
        _ = float(np.asarray(jnp.sum(index.knn_dists[:, 0])))
        build_s = time.time() - t0
    finally:
        graph_mod.BRUTE_BUILD_FLOP_BUDGET = saved
    print(f"forced-NND build: {build_s:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    sample = np.sort(
        rng.choice(args.n, size=min(args.sample, args.n), replace=False)
    )
    sq = index.sqnorms[: args.n]
    # ops-level return order is (dists, ids)
    _, gti = blocked_query_topk(
        index.vectors[jnp.asarray(sample)], index.vectors[: args.n],
        args.k + 1, index.metric, x_sqnorm=sq, selector="exact",
    )
    gti = np.asarray(gti)
    g_ids = np.asarray(index.knn_ids[jnp.asarray(sample)])
    hits = 0
    for r, row in enumerate(sample):
        gt_row = [j for j in gti[r] if j != row][: args.k]
        hits += len(set(gt_row) & set(g_ids[r][: args.k].tolist()))
    g_recall = hits / (len(sample) * args.k)
    out = {
        "workload": f"forced-NND {args.n}x{args.dim}d k={args.k}",
        "build_s": round(build_s, 1),
        "graph_recall": round(g_recall, 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
