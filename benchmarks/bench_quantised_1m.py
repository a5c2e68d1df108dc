"""Scale benchmark: SQ8 / BF16 quantised IVF at 1M×256d (BASELINE config 3).

The reference benchmarks its quantised kernels at 150k×32d / 50k×128d
(docs/benchmarks_quantised.md); this workload scales them to 1M×256d —
int8 and bf16 distance kernels on the MXU with recall measured against
both the exact f32 ground truth and the f32 IVF index at the same nprobe
(isolating quantisation loss from probe loss).

  python -m benchmarks.bench_quantised_1m [--n 1000000] [--dim 256]

Everything stays on device; GT is cached in /tmp keyed to the generator.
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
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--n-clusters", type=int, default=100)
    p.add_argument("--nlist", type=int, default=1024)
    p.add_argument("--nq", type=int, default=30_000)
    p.add_argument("--nq-gt", type=int, default=1_000)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobes", type=int, nargs="+", default=[16, 32])
    args = p.parse_args(argv)

    t0 = time.time()
    x, _ = generate_clustered_data_device(
        args.n, args.dim, args.n_clusters, seed=42
    )
    q = subsample_with_noise_device(x, args.nq, seed=42)
    print(f"data generated on device in {time.time() - t0:.1f}s", flush=True)

    # cache key carries every input the GT depends on: generator shape and
    # seed, the query-draw size (subsample draws nq indices — the first
    # nq_gt queries change whenever --nq changes), and k
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
            # host-level query chunks: at 1M×256d HIGHEST a single
            # 1000-query dispatch runs multi-minute and can wedge the
            # tunnelled worker (same failure mode as the full-width NND
            # rounds, PROGRESS_NOTES r3s4) — keep each dispatch short
            parts = [
                np.asarray(
                    exact.query(q[j : j + 128], args.k)[0]
                )
                for j in range(0, args.nq_gt, 128)
            ]
            t = np.concatenate(parts)
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

    builders = [
        ("ivf-f32", ann.build_ivf_index),
        ("ivf-bf16", ann.build_ivf_bf16_index),
        ("ivf-sq8", ann.build_ivf_sq8_index),
    ]
    # f32-IVF results at each nprobe: the quantised rows report recall both
    # vs exact GT and vs these (same probes, f32 scoring) — the latter
    # isolates quantisation loss from probe loss
    f32_ids: dict[int, np.ndarray] = {}
    for name, build in builders:
        build_s = float("inf")
        index = None
        for _ in range(2):
            index = None
            t0 = time.time()
            index = build(x, nlist=args.nlist)
            build_s = min(build_s, time.time() - t0)
        print(
            f"{name}: build {build_s:.1f}s warm | "
            f"{index.memory_usage_bytes() / 1e9:.2f} GB", flush=True
        )
        for npb in args.nprobes:
            ai, _ = index.query(
                q[: args.nq_gt], args.k, nprobe=npb, approx=True
            )
            rec = calculate_recall(ti, ai, args.k)
            if name == "ivf-f32":
                f32_ids[npb] = np.asarray(ai)
                vs_f32 = ""
            elif npb in f32_ids:
                rq = calculate_recall(f32_ids[npb], ai, args.k)
                vs_f32 = f"  vs-f32-ivf {rq:.4f}"
            else:
                vs_f32 = ""
            index.query(q, args.k, nprobe=npb, approx=True)
            times = []
            for _ in range(3):
                t0 = time.time()
                index.query(q, args.k, nprobe=npb, approx=True)
                times.append(time.time() - t0)
            qps = args.nq / min(times)
            print(
                f"  {name} nprobe={npb}: recall {rec:.4f}  "
                f"{qps:,.0f} QPS{vs_f32}", flush=True,
            )
        del index


if __name__ == "__main__":
    main()
