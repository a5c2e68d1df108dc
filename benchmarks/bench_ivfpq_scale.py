"""Scale benchmark: IVF-PQ at 10M×128d on ONE chip.

The reference's largest published workload is 2.5M×32d (GPU NND,
docs/benchmarks_gpu.md:1028-1037); its IVF-GPU path sizes batches against
a 1.5 GB VRAM model (ivf_gpu.rs:23). One v5e chip holds the full 10M×128d
f32 database (5.1 GB) + int8 fast-scan codes (1.3 GB) in HBM with room to
spare — this bench demonstrates the single-chip capacity story the sharded
path then multiplies (parallel/ivf_sharded.py takes the same index across
a mesh for 100M+).

  python -m benchmarks.bench_ivfpq_scale [--n 10000000] [--nlist 4096]

Everything (data, ground truth, build, query) stays on device; only
[nq, k] results come back. Ground truth is validated with the noisy-
subsample distance invariant (see bench.py) and cached in /tmp.
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
    p.add_argument("--m", type=int, default=None, help="default: dim (int8 fast scan)")
    p.add_argument("--nlist", type=int, default=4096)
    # 30k queries: at 10k the ~30 ms tunnel dispatch plus the [nq, 2k]
    # result readback (~30 MB/s here) were ~55% of the measured batch —
    # the bigger batch amortizes the fixed cost without changing per-query
    # work (a production host pays neither)
    p.add_argument("--nq", type=int, default=30_000)
    p.add_argument("--nq-gt", type=int, default=1_000)
    p.add_argument("--k", type=int, default=10)
    # recall saturates at ~0.953 (quantisation-limited) by nprobe 12
    p.add_argument("--nprobes", type=int, nargs="+", default=[8, 12, 16])
    # also measure each point with single-bf16-pass query scoring
    # (q_split=False): where the recall ceiling is quantisation, the hi/lo
    # split's extra MXU pass buys nothing
    p.add_argument("--sweep-qsplit", action="store_true")
    args = p.parse_args(argv)
    m = args.m if args.m is not None else args.dim

    t0 = time.time()
    x, _ = generate_clustered_data_device(
        args.n, args.dim, args.n_clusters, seed=42
    )
    q = subsample_with_noise_device(x, args.nq, seed=42)
    print(f"data generated on device in {time.time() - t0:.1f}s", flush=True)

    # cache key carries every input the GT depends on (generator shape,
    # seed, query-draw size, k); chunked queries keep each dispatch short —
    # one multi-minute dispatch can wedge the tunnelled worker
    gt_path = (
        f"/tmp/gt_dev_{args.n}_{args.dim}d_c{args.n_clusters}"
        f"_q{args.nq}_g{args.nq_gt}_k{args.k}_s42.npz"
    )
    if os.path.exists(gt_path) and np.load(gt_path)["ti"].shape[0] >= args.nq_gt:
        ti = np.load(gt_path)["ti"][: args.nq_gt]
    else:
        print("computing exact ground truth on device...", flush=True)
        t0 = time.time()
        exact = ann.build_exhaustive_index(x)
        ti = None
        for _ in range(3):
            parts = [
                np.asarray(exact.query(q[j : j + 128], args.k)[0])
                for j in range(0, args.nq_gt, 128)
            ]
            t = np.concatenate(parts)
            # queries are σ=0.05 noisy subsamples — median NN distance must
            # sit near 0.05²·dim (tunnelled workers can return corrupted
            # buffers after a crash/restart; don't trust unvalidated GT)
            _, td = exact.query(q[:64], args.k)
            if float(np.median(np.asarray(td)[:, 0])) < 40 * 0.0025 * args.dim:
                ti = t
                break
            time.sleep(20)
        if ti is None:
            raise RuntimeError("exhaustive GT failed its sanity invariant")
        np.savez(gt_path, ti=ti)
        del exact
        print(f"ground truth in {time.time() - t0:.1f}s", flush=True)

    build_s = float("inf")
    index = None
    for _ in range(2):  # second build = warm (compile-free) cost
        index = None  # free the previous index's HBM before rebuilding
        t0 = time.time()
        index = ann.build_ivf_pq_index(x, nlist=args.nlist, m=m, seed=42)
        build_s = min(build_s, time.time() - t0)
    print(
        f"build {build_s:.1f}s warm | index "
        f"{index.memory_usage_bytes() / 1e9:.2f} GB", flush=True
    )

    best = None
    # non-sweep runs use the index default (None → auto: single-pass for
    # i8dec modes); the sweep measures both explicitly
    for npb in args.nprobes:
        for q_split in ((True, False) if args.sweep_qsplit else (None,)):
            ai, _ = index.query(
                q[: args.nq_gt], args.k, nprobe=npb, approx=True,
                q_split=q_split,
            )
            rec = calculate_recall(ti, ai, args.k)
            index.query(  # warm full batch
                q, args.k, nprobe=npb, approx=True, q_split=q_split
            )
            times = []
            for _ in range(2):
                t0 = time.time()
                index.query(
                    q, args.k, nprobe=npb, approx=True, q_split=q_split
                )
                times.append(time.time() - t0)
            qps = args.nq / min(times)
            tag = "" if q_split in (True, None) else " (single-pass queries)"
            print(
                f"nprobe={npb}: recall {rec:.4f}  {qps:,.0f} QPS{tag}",
                flush=True,
            )
            if best is None or (rec >= 0.95) > (best[0] >= 0.95) or (
                (rec >= 0.95) == (best[0] >= 0.95) and qps > best[1]
            ):
                best = (rec, qps, npb, q_split)
    print(
        f"best: recall {best[0]:.4f} at {best[1]:,.0f} QPS (nprobe={best[2]}, "
        f"q_split={best[3]}) on {args.n:,}×{args.dim}d — one chip"
    )


if __name__ == "__main__":
    main()
