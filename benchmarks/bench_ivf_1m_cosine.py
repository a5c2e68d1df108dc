"""BASELINE config 2: plain IVF at 1M×128d, euclidean AND cosine.

The flagship docs cover 1M×128d via IVF-PQ (euclidean); this measures the
un-quantised IVF index at the same shape under both metrics — k-means
routing (spherical Lloyd for cosine), fused approximate scan, recall vs
an exact device ground truth per metric.

  python -m benchmarks.bench_ivf_1m_cosine [--n 1000000] [--dim 128]
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
    p.add_argument("--nq", type=int, default=30_000)
    p.add_argument("--nq-gt", type=int, default=1_000)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobes", type=int, nargs="+", default=[8, 16, 32])
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)

    x, _ = generate_clustered_data_device(
        args.n, args.dim, args.n_clusters, seed=42
    )
    q = subsample_with_noise_device(x, args.nq, seed=42)
    out = {"workload": f"ivf {args.n}x{args.dim}d nl{args.nlist}",
           "metrics": {}}
    for metric in ("euclidean", "cosine"):
        exact = ExhaustiveIndex(x, metric)
        # host-chunked GT dispatches (long single dispatches wedge the
        # tunnelled worker)
        ti = np.concatenate([
            np.asarray(exact.query(q[j : j + 256], args.k)[0])
            for j in range(0, args.nq_gt, 256)
        ])
        del exact
        t0 = time.time()
        index = ann.build_ivf_index(x, nlist=args.nlist, dist_metric=metric,
                                    seed=42)
        build_s = time.time() - t0
        points = []
        for npb in args.nprobes:
            ai, _ = index.query(q[: args.nq_gt], args.k, nprobe=npb,
                                approx=True)
            rec = calculate_recall(ti, ai, args.k)
            index.query(q, args.k, nprobe=npb, approx=True)  # warm
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.time()
                index.query(q, args.k, nprobe=npb, approx=True)
                best = min(best, time.time() - t0)
            qps = args.nq / best
            print(f"{metric} np{npb}: recall {rec:.4f}  {qps:,.0f} QPS",
                  flush=True)
            points.append(
                {"nprobe": npb, "recall": round(rec, 4), "qps": round(qps)}
            )
        out["metrics"][metric] = {
            "build_s": round(build_s, 1), "points": points
        }
        del index
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
