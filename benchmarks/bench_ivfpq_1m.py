"""North-star benchmark: IVF-PQ on 1M×128d (BASELINE.json config 4 scale-down).

Target: ≥100k QPS/chip at recall@10 ≥ 0.95. Run on the real TPU:

  python -m benchmarks.bench_ivfpq_1m [--m 64] [--nlist 1024]

Ground truth is cached in /tmp (exact f32 HIGHEST scan is ~3 min at this
scale). Current round-1 status and known bottlenecks are tracked in
PROGRESS_NOTES.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

import annsearch_tpu as ann
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise
from annsearch_tpu.utils.metrics import calculate_recall


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--m", type=int, default=64)
    p.add_argument("--nlist", type=int, default=1024)
    p.add_argument("--nq", type=int, default=10_000)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobes", type=int, nargs="+", default=[8, 16, 32])
    args = p.parse_args(argv)

    x, _ = generate_clustered_data(args.n, args.dim, 100, seed=42)
    q = subsample_with_noise(x, args.nq, seed=42)

    gt_path = f"/tmp/gt_{args.n}_{args.dim}d.npz"
    if os.path.exists(gt_path):
        ti = np.load(gt_path)["ti"][: args.nq]
    else:
        print("computing exact ground truth (slow, cached after)...", flush=True)
        exact = ann.build_exhaustive_index(x)
        ti, _ = exact.query(q, args.k)
        np.savez(gt_path, ti=ti)
        del exact

    t0 = time.time()
    index = ann.build_ivf_pq_index(x, nlist=args.nlist, m=args.m, seed=42)
    print(f"build {time.time() - t0:.1f}s", flush=True)

    best = None
    for npb in args.nprobes:
        ai, _ = index.query(q, args.k, nprobe=npb, approx=True)
        rec = calculate_recall(ti, ai, args.k)
        t0 = time.time()
        index.query(q, args.k, nprobe=npb, approx=True)
        qps = args.nq / (time.time() - t0)
        print(f"nprobe={npb}: recall {rec:.4f}  {qps:,.0f} QPS", flush=True)
        if best is None or (rec, qps) > best[:2]:
            best = (rec, qps, npb)
    print(
        f"best: recall {best[0]:.4f} at {best[1]:,.0f} QPS (nprobe={best[2]}) "
        f"| target: ≥0.95 recall at ≥100k QPS"
    )


if __name__ == "__main__":
    main()
