"""BASELINE config 1: exhaustive flat index, euclidean, GaussianNoise
100k×128d, k=10 SELF-query (the reference's `examples/gridsearch` path;
its published analogue is the 150k×32d self-kNN at 15,706 ms CPU,
docs/benchmarks_standard.md:71 — this workload is ~3.4× that in n·d).

Exact by construction (MXU blocked scan) — the number of record is wall
time; recall vs a brute-force numpy slice is asserted as a sanity check.

  python -m benchmarks.bench_config1_exhaustive
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

import annsearch_tpu as ann
from annsearch_tpu.utils.data import generate_clustered_data_device
from annsearch_tpu.utils.metrics import calculate_recall


def main(argv=None):
    n, d, k = 100_000, 128, 10
    x, _ = generate_clustered_data_device(n, d, 25, seed=42)

    t0 = time.time()
    index = ann.build_exhaustive_index(x, "euclidean")
    build_s = time.time() - t0

    # warm + timed self-query (best of 2 — tunnel variance is ±2×)
    ids, dists = ann.query_exhaustive_self(index, k, return_dist=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        ids, dists = ann.query_exhaustive_self(index, k, return_dist=True)
        best = min(best, time.time() - t0)

    # sanity: first 256 rows vs numpy brute force
    xs = np.asarray(x[:n])
    sub = xs[:256]
    d2 = ((sub[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]
    rec = calculate_recall(gt, np.asarray(ids[:256]), k)

    out = {
        "workload": f"exhaustive self-query {n}x{d}d k={k} euclidean",
        "build_s": round(build_s, 2),
        "self_query_s": round(best, 2),
        "qps": round(n / best),
        "recall_vs_brute_sample": round(float(rec), 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
