"""IVF-RaBitQ at 1M×128d (BASELINE config 4's binary-rerank pipeline at scale).

All prior RaBitQ rows live at the reference's 50k×256d workload
(docs/benchmarks_binary.md:2443-2444 — IVF-RaBitQ nl158 np12 rf20:
601 ms @ recall 0.9935); this measures the same pipeline at 20× the rows:
QR-rotated sign bits + (dist, L1-corr) estimator scan over IVF cells, then
exact f32 rerank of rf·k candidates. Reports recall@10 vs an exact device
ground truth and end-to-end QPS at several (nprobe, rerank-factor) points.

  python -m benchmarks.bench_rabitq_1m [--n 1000000] [--dim 128]
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

import annsearch_tpu as ann
from annsearch_tpu.models.exhaustive import ExhaustiveIndex
from annsearch_tpu.utils.data import (
    generate_clustered_data_device,
    subsample_with_noise_device,
)
from annsearch_tpu.utils.metrics import calculate_recall


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--n-clusters", type=int, default=100)
    p.add_argument("--nlist", type=int, default=1024)
    p.add_argument("--nq", type=int, default=10_000)
    p.add_argument("--nq-gt", type=int, default=1_000)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--points", type=str, nargs="+",
                   default=["64:10", "64:20", "128:20"],
                   help="nprobe:rerank_factor pairs")
    p.add_argument("--reps", type=int, default=2)
    args = p.parse_args(argv)

    x, _ = generate_clustered_data_device(
        args.n, args.dim, args.n_clusters, seed=42
    )
    q = subsample_with_noise_device(x, args.nq, seed=42)

    exact = ExhaustiveIndex(x, "euclidean")
    ti = np.concatenate([
        np.asarray(exact.query(q[j : j + 256], args.k)[0])
        for j in range(0, args.nq_gt, 256)
    ])
    del exact

    t0 = time.time()
    index = ann.build_ivf_index_rabitq(
        x, nlist=args.nlist, seed=42, verbose=True
    )
    build_s = time.time() - t0
    print(f"build: {build_s:.1f}s  "
          f"({index.memory_usage_bytes() / 2**20:.0f} MB index)", flush=True)

    out = {"workload": f"ivf-rabitq {args.n}x{args.dim}d nl{args.nlist}",
           "build_s": round(build_s, 1),
           "index_mb": round(index.memory_usage_bytes() / 2**20),
           "points": []}
    for spec in args.points:
        npb, rf = (int(v) for v in spec.split(":"))
        ai, _ = index.query(q[: args.nq_gt], args.k, nprobe=npb,
                            rerank="exact", rerank_factor=rf)
        rec = calculate_recall(ti, ai, args.k)
        index.query(q, args.k, nprobe=npb, rerank="exact",
                    rerank_factor=rf)  # warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            index.query(q, args.k, nprobe=npb, rerank="exact",
                        rerank_factor=rf)
            best = min(best, time.time() - t0)
        qps = args.nq / best
        print(f"np{npb} rf{rf}: recall {rec:.4f}  {qps:,.0f} QPS",
              flush=True)
        out["points"].append(
            {"nprobe": npb, "rerank_factor": rf,
             "recall": round(rec, 4), "qps": round(qps)}
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
