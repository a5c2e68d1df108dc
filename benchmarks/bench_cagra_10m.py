"""10M×128d CAGRA on ONE chip — approximate build path + beam query.

The config-5-scale graph workload (VERDICT r3 #4): 4× the reference's
largest published graph build (2.5M×32d, benchmarks_gpu.md:964-1037) and
far above the brute FLOP budget, so the build runs the REAL approximate
pipeline (RP-forest init → rate-adaptive chunked NN-descent rounds) — the
same regime the reference's GPU-NND lives in — then CAGRA-prunes a
navigable graph and answers queries by routed-entry beam search.

Reports: build seconds (on-chip, checksum-forced), sampled kNN-graph
recall vs an independent exact scan, and query recall@10 / QPS vs exact
ground truth on a query sample. Data is generated on device (clustered
suite — same generator as the 10M IVF-PQ rows in docs/benchmarks_tpu.md,
so the two flagship 10M sections share a workload).

  python -m benchmarks.bench_cagra_10m [--n 10000000] [--dim 128]
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

from annsearch_tpu.models.graph import NNDescentIndex
from annsearch_tpu.ops.topk import blocked_query_topk
from annsearch_tpu.utils.data import (
    generate_clustered_data_device,
    subsample_with_noise_device,
)
from annsearch_tpu.utils.metrics import calculate_recall


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--n-clusters", type=int, default=1000)
    p.add_argument("--k-graph", type=int, default=16,
                   help="stored kNN-graph width")
    p.add_argument("--build-k", type=int, default=32,
                   help="NND working width (wider pools converge)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nq", type=int, default=10_000)
    p.add_argument("--nq-gt", type=int, default=1_000)
    p.add_argument("--graph-sample", type=int, default=4096)
    p.add_argument("--beam", type=int, nargs="+", default=[32, 48])
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--refine", type=int, default=0,
                   help="two-hop refinement sweeps after NND convergence")
    args = p.parse_args(argv)

    t0 = time.time()
    # sentinel-padded generation + zero-copy adoption: appending the
    # sentinel row to an existing 5.1 GB device array transiently doubles
    # residency and OOMs the chip next to the NND working set
    x, _ = generate_clustered_data_device(
        args.n, args.dim, args.n_clusters, seed=42, sentinel=True
    )
    q = subsample_with_noise_device(x, args.nq, seed=42, n_rows=args.n)
    chk = float(np.asarray(jnp.sum(x[:8, :8]) + jnp.sum(q[:8, :8])))
    print(f"data on device in {time.time() - t0:.1f}s (chk {chk:.3f})",
          flush=True)

    t0 = time.time()
    index = NNDescentIndex(
        x, k=args.k_graph, build_k=args.build_k, verbose=True,
        refine_rounds=args.refine, has_sentinel=True,
    )
    del x  # the index adopted the buffer — drop the second reference
    _ = float(np.asarray(jnp.sum(index.knn_dists[:, 0])))
    build_s = time.time() - t0
    print(f"build (approximate path): {build_s:.1f}s on-chip", flush=True)

    # sampled graph recall vs an independent exact scan
    # GT scans run against the sentinel-PADDED table (slicing
    # index.vectors[:n] eagerly copies 5.1 GB); the zero sentinel row sits
    # at distance |q|² ≈ 2,700 here but is filtered by id anyway
    rng = np.random.default_rng(0)
    sample = np.sort(
        rng.choice(args.n, size=min(args.graph_sample, args.n), replace=False)
    )
    sq = index.sqnorms
    gtd, gti = blocked_query_topk(
        index.vectors[jnp.asarray(sample)], index.vectors,
        args.k_graph + 2, index.metric, x_sqnorm=sq, selector="exact",
    )
    gti = np.asarray(gti)
    g_ids = np.asarray(index.knn_ids[jnp.asarray(sample)])
    hits = 0
    for r, row in enumerate(sample):
        gt_row = [
            j for j in gti[r] if j != row and j < args.n
        ][: args.k_graph]
        hits += len(set(gt_row) & set(g_ids[r][: args.k_graph].tolist()))
    g_recall = hits / (len(sample) * args.k_graph)
    print(f"graph recall@{args.k_graph} (sampled): {g_recall:.4f}",
          flush=True)

    # query ground truth on the first nq_gt queries (ops-level return
    # order is (dists, ids) — models return (ids, dists))
    _, ti_p = blocked_query_topk(
        q[: args.nq_gt], index.vectors, args.k + 1, index.metric,
        x_sqnorm=sq, selector="exact",
    )
    ti_p = np.asarray(ti_p)
    ti = np.stack([
        np.asarray([j for j in row if j < args.n][: args.k])
        for row in ti_p
    ])

    out = {
        "workload": f"cagra {args.n}x{args.dim}d (approx build path)",
        "build_s": round(build_s, 1),
        "graph_recall": round(g_recall, 4),
        "points": [],
    }
    for bw in args.beam:
        ai, _ = index.query(
            q[: args.nq_gt], args.k, beam=bw, exact_fallback=False
        )
        rec = calculate_recall(ti, ai, args.k)
        index.query(q, args.k, beam=bw, exact_fallback=False)  # warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            index.query(q, args.k, beam=bw, exact_fallback=False)
            best = min(best, time.time() - t0)
        qps = args.nq / best
        print(
            f"beam={bw}: recall@{args.k} {rec:.4f}  {qps:,.0f} QPS",
            flush=True,
        )
        out["points"].append(
            {"beam": bw, "recall": round(rec, 4), "qps": round(qps)}
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
