"""Recall-1.0 verification of the IVF exact tier (VERDICT r3 #6).

Reference workload: 500k×64d lowrank, nlist=500, nprobe=22, 15k queries,
k=15 — the reference CPU IVF row is 639 ms @ recall 1.0
(/root/reference/docs/benchmarks_gpu.md:338-345).

Round-3 status was 414 ms @ 0.9996: the residual loss is near-tie rank
flips *between two f32-grade computations* (the tier's elementwise-f32
rescore vs the ground truth's f32-HIGHEST matmul identity) — both carry
~1e-6 relative noise and disagree on sub-grain ties. The reference
sidesteps this by computing GT and query with the SAME scalar kernels.

This bench settles ties at a grade where ranking is unambiguous: data and
queries are f64, so BOTH the ground truth (ExhaustiveIndex f64 pool
rescore) and the IVF exact tier (f32 fused pre-selection → host f64 pool
rescore, models/ivf_base.py query()) produce f64-exact distances. Any
recall < 1.0 is then a REAL pool drop, not measurement noise. Also prints
the f32-query recall against both GTs for the measurement-noise record.

  python -m benchmarks.bench_exact_tier
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

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
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)

    t0 = time.time()
    x, _ = generate_data(
        "lowrank", args.n, args.dim, 12, seed=42, intrinsic_dim=16
    )
    rng = np.random.default_rng(0)
    qi = rng.choice(args.n, size=args.nq, replace=False)
    q = x[qi] + (0.05 * rng.standard_normal((args.nq, args.dim))).astype(
        np.float32
    )
    x64 = x.astype(np.float64)
    q64 = q.astype(np.float64)
    print(f"data {time.time() - t0:.1f}s", flush=True)

    # f64-grade ground truth (device f32 HIGHEST pool + host f64 rescore),
    # cached — it costs ~10 min through a cold tunnel
    import os

    gt_path = (
        f"/tmp/gt_exact_tier_{args.n}_{args.dim}d_q{args.nq}"
        f"_k{args.k}.npz"
    )
    if os.path.exists(gt_path):
        z = np.load(gt_path)
        ti64, ti32 = z["ti64"], z["ti32"]
    else:
        t0 = time.time()
        exact = ExhaustiveIndex(x64, "euclidean")
        ti64, td64 = exact.query(q64, args.k)
        assert td64.dtype == np.float64
        print(f"f64 GT {time.time() - t0:.1f}s", flush=True)
        # f32-grade ground truth (the scale suite's usual GT)
        ti32, _ = exact.query(q, args.k)
        del exact
        np.savez(gt_path, ti64=ti64, ti32=ti32)

    t0 = time.time()
    index = IvfIndex(x64, "euclidean", nlist=args.nlist, seed=42)
    print(f"build {time.time() - t0:.1f}s", flush=True)

    # exact tier, f64 queries: fused pre-selection + host f64 pool rescore
    index.query(q64[:256], args.k, nprobe=args.nprobe)  # warm
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        ai64, ad64 = index.query(q64, args.k, nprobe=args.nprobe)
        best = min(best, time.time() - t0)
    rec64 = calculate_recall(ti64, ai64, args.k)
    print(
        f"exact tier (f64 queries): {best * 1000:,.0f} ms  "
        f"recall vs f64 GT = {rec64:.4f}", flush=True
    )

    # exact tier, f32 queries (the round-3 operating point, both GTs)
    index.query(q[:256], args.k, nprobe=args.nprobe)
    best32 = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        ai32, _ = index.query(q, args.k, nprobe=args.nprobe)
        best32 = min(best32, time.time() - t0)
    print(
        f"exact tier (f32 queries): {best32 * 1000:,.0f} ms  "
        f"recall vs f32 GT = {calculate_recall(ti32, ai32, args.k):.4f}  "
        f"vs f64 GT = {calculate_recall(ti64, ai32, args.k):.4f}",
        flush=True,
    )

    # certified tier: the triangle-inequality probe certificate re-probes
    # flagged queries — recall must be 1.0000 by construction, at the cost
    # of one extra certificate dispatch + the flagged-query re-scan
    index.query(q[:256], args.k, nprobe=args.nprobe, certify=True)
    bestc = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        aic, _ = index.query(q, args.k, nprobe=args.nprobe, certify=True)
        bestc = min(bestc, time.time() - t0)
    print(
        f"CERTIFIED tier (f32 queries): {bestc * 1000:,.0f} ms  "
        f"recall vs f64 GT = {calculate_recall(ti64, aic, args.k):.4f}",
        flush=True,
    )
    bestc64 = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        aic64, _ = index.query(q64, args.k, nprobe=args.nprobe, certify=True)
        bestc64 = min(bestc64, time.time() - t0)
    print(
        f"CERTIFIED tier (f64 queries): {bestc64 * 1000:,.0f} ms  "
        f"recall vs f64 GT = {calculate_recall(ti64, aic64, args.k):.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
