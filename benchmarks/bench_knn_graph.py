"""Full kNN-graph generation benchmark at 1M–2.5M scale.

Mirrors the reference's "Generation of a kNN graph with CAGRA" suites
(`/root/reference/docs/benchmarks_gpu.md` 1M×32d / 1M×64d / 2.5M×32d
sections): lowrank data, k=15 graph, recall vs exact ground truth.

On this hardware the graph is built brute-force by the fused MXU scan
(models/graph.BRUTE_BUILD_FLOP_BUDGET economics inversion): exact
distances (f32-equivalent mantissa-split passes), near-exact selection
(the fused bins selector has a measured ~1e-3 tail loss — recall
0.9988–0.999, not 1.0). The honest
comparison rows in the reference tables are both the approximate GPU-NND
totals (e.g. 24.7 s @ 0.9885 at 2.5M) and the exact GPU-Exhaustive row
(1,478 s at 2.5M).

Reports on-chip build time (device-forced via a scalar checksum readback)
and e2e time including the [n, k]×2 host readback — the tunnel this
environment runs through moves ~30 MB/s, which a production TPU host
does not pay. Recall is measured on a random row sample against an
independently computed exact f32 ground truth (different code path:
XLA chunked scan, selector="exact").

Usage:
  python -m benchmarks.bench_knn_graph --n 2500000 --dim 32
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    import jax.numpy as jnp

    from annsearch_tpu.models.graph import NNDescentIndex
    from annsearch_tpu.ops.topk import blocked_query_topk
    from annsearch_tpu.utils.data import generate_data
    from annsearch_tpu.utils.dist import sq_norms

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--k", type=int, default=15)
    ap.add_argument("--sample", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--force-nnd", action="store_true",
        help="disable the brute FLOP budget so the approximate NND build "
        "path runs even where the exact MXU scan would be cheaper — the "
        "regime 10M-scale builds live in",
    )
    ap.add_argument(
        "--build-k", type=int, default=None,
        help="intermediate graph width (default: k for the brute path — "
        "it is exact at any width — and 2k for NND rounds, which need "
        "the wider candidate pools to converge)",
    )
    ap.add_argument("--refine", type=int, default=0,
                    help="two-hop refinement sweeps after convergence")
    args = ap.parse_args()

    if args.force_nnd:
        import annsearch_tpu.models.graph as _g

        _g.BRUTE_BUILD_FLOP_BUDGET = 0

    t0 = time.time()
    x_host, _ = generate_data(
        "lowrank", args.n, args.dim, 12, seed=args.seed, intrinsic_dim=16
    )
    t_gen = time.time() - t0
    t0 = time.time()
    x = jnp.asarray(x_host)
    xsq = sq_norms(x)
    _ = float(np.asarray(jnp.sum(x[:8, :8]) + jnp.sum(xsq[:8])))
    t_up = time.time() - t0
    print(f"gen {t_gen:.2f}s  upload+force {t_up:.2f}s", flush=True)

    best_chip = best_e2e = float("inf")
    ids = dists = None
    for rep in range(args.reps):
        t0 = time.time()
        build_k = args.build_k
        if build_k is None and not args.force_nnd:
            build_k = args.k
        idx = NNDescentIndex(
            x, k=args.k, build_k=build_k, refine_rounds=args.refine,
            verbose=args.force_nnd,
        )
        # scalar checksum forces the whole build on device without the
        # [n, k] readback (jax.block_until_ready is unreliable here)
        _ = float(np.asarray(jnp.sum(idx.knn_dists[:, 0])))
        t_chip = time.time() - t0
        ids, dists = idx.generate_knn(args.k, mode="graph")
        t_e2e = time.time() - t0
        best_chip = min(best_chip, t_chip)
        best_e2e = min(best_e2e, t_e2e)
        print(
            f"rep {rep}: on-chip {t_chip:.2f}s  e2e {t_e2e:.2f}s", flush=True
        )

    # sampled exact recall: independent ground truth through the XLA
    # chunked scan (true f32 HIGHEST, no Pallas/bins involvement)
    rng = np.random.default_rng(0)
    sample = np.sort(
        rng.choice(args.n, size=min(args.sample, args.n), replace=False)
    )
    q = x[jnp.asarray(sample)]
    gtd, gti = blocked_query_topk(
        q, x, args.k + 1, idx.metric, x_sqnorm=xsq, selector="exact"
    )
    gti = np.asarray(gti)
    hits = 0
    for r, row in enumerate(sample):
        gt_row = [j for j in gti[r] if j != row][: args.k]
        hits += len(set(gt_row) & set(ids[row][: args.k].tolist()))
    recall = hits / (len(sample) * args.k)

    print(
        json.dumps(
            {
                "workload": f"knn_graph {args.n}x{args.dim}d k={args.k}",
                "on_chip_s": round(best_chip, 2),
                "e2e_s": round(best_e2e, 2),
                "recall_sampled": round(recall, 4),
                "sample": int(len(sample)),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
