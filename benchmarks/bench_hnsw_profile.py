"""HNSW build/query profile at the reference's native workload.

VERDICT r3 #7: build was 5.9 s at 150k×32d (reference 1,965 ms,
BASELINE.md:16) and the ef100 query row predates the beam/8 retune.
This script times every build phase (HnswIndex verbose marks) and the
retuned native query path (exact_fallback=False) at several ef settings,
with recall against an exact device scan.

  python -m benchmarks.bench_hnsw_profile [--n 150000] [--dim 32]
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

from annsearch_tpu.models.exhaustive import ExhaustiveIndex
from annsearch_tpu.models.hnsw import HnswIndex
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise
from annsearch_tpu.utils.metrics import calculate_recall


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=150_000)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--n-clusters", type=int, default=25)
    p.add_argument("--nq", type=int, default=15_000)
    p.add_argument("--k", type=int, default=15)
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--efs", type=int, nargs="+", default=[50, 100, 200])
    p.add_argument("--build-reps", type=int, default=2)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)

    x, _ = generate_clustered_data(args.n, args.dim, args.n_clusters, seed=42)
    q = subsample_with_noise(x, args.nq, seed=42)
    ti, _ = ExhaustiveIndex(x, "euclidean").query(q, args.k)

    # warm-build timing: rep 1 pays one-off jit compiles through the tunnel
    build_s = float("inf")
    index = None
    for rep in range(args.build_reps):
        t0 = time.time()
        index = HnswIndex(x, "euclidean", m=args.m, verbose=True)
        b = time.time() - t0
        build_s = min(build_s, b)
        print(f"build rep {rep}: {b:.2f}s", flush=True)

    out = {
        "workload": f"hnsw {args.n}x{args.dim}d m={args.m}",
        "build_s": round(build_s, 2),
        "points": [],
    }
    for ef in args.efs:
        ai, _ = index.query(q, args.k, ef_search=ef, exact_fallback=False)
        rec = calculate_recall(ti, ai, args.k)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            index.query(q, args.k, ef_search=ef, exact_fallback=False)
            best = min(best, time.time() - t0)
        print(
            f"ef={ef}: recall@{args.k} {rec:.4f}  {best * 1000:,.0f} ms",
            flush=True,
        )
        out["points"].append(
            {"ef": ef, "recall": round(rec, 4), "ms": round(best * 1000)}
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
