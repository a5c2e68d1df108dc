"""A/B the budget-gated beam regime (single-pass bf16 walk + round-5 f32
final-pool rescore) against the f32-grade hi/lo path on the SAME index.

The 10M×128d table is past ANNSEARCH_HL_BYTES / ANNSEARCH_NBR_PACK_BYTES,
so its beam queries score candidates in single-pass bf16 — the diagnosed
cause of the 10M query-recall gap (docs/benchmarks_tpu.md §CAGRA). This
runs one mid-size build and queries it twice — once with both budgets
zeroed (the 10M regime), once ungated — and reports recall@10 for each.
Parity here means the rescore closed the scoring half of the gap (the
other half is nav-graph out-degree).

  python -m benchmarks.diag_beam_rescore [--n 500000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from annsearch_tpu.models.exhaustive import ExhaustiveIndex
from annsearch_tpu.models.graph import NNDescentIndex
from annsearch_tpu.utils.data import (
    generate_clustered_data_device,
    subsample_with_noise_device,
)
from annsearch_tpu.utils.metrics import calculate_recall


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=500_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--nq", type=int, default=2_000)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--beam", type=int, default=48)
    args = p.parse_args(argv)

    x, _ = generate_clustered_data_device(args.n, args.dim, 50, seed=42)
    q = subsample_with_noise_device(x, args.nq, seed=42)

    exact = ExhaustiveIndex(x, "euclidean")
    gt = np.concatenate([
        np.asarray(exact.query(q[j : j + 256], args.k)[0])
        for j in range(0, args.nq, 256)
    ])
    del exact

    os.environ["ANNSEARCH_NO_EXACT_FALLBACK"] = "1"
    t0 = time.time()
    index = NNDescentIndex(x, "euclidean", k=30, verbose=True)
    build_s = time.time() - t0
    print(f"build {build_s:.1f}s", flush=True)

    out = {"workload": f"nnd {args.n}x{args.dim}d beam{args.beam}",
           "build_s": round(build_s, 1)}
    for label, hl_budget in (("gated_bf16_walk", "0"), ("hi_lo_f32", None)):
        if hl_budget is not None:
            os.environ["ANNSEARCH_HL_BYTES"] = hl_budget
            os.environ["ANNSEARCH_NBR_PACK_BYTES"] = hl_budget
        else:
            os.environ.pop("ANNSEARCH_HL_BYTES", None)
            os.environ.pop("ANNSEARCH_NBR_PACK_BYTES", None)
        # the gates are read at first query (nav_hl_split / maybe_pack) —
        # reset the cached split so each arm re-evaluates them
        if hasattr(index, "_nav_hl"):
            del index._nav_hl
        index._packed_nbrs = None
        ids, _ = index.query(q, args.k, beam=args.beam,
                             exact_fallback=False)
        t0 = time.time()
        ids, _ = index.query(q, args.k, beam=args.beam,
                             exact_fallback=False)
        dt = time.time() - t0
        rec = calculate_recall(gt, ids, args.k)
        print(f"{label}: recall {rec:.4f}  {args.nq / dt:,.0f} QPS",
              flush=True)
        out[label] = {"recall": round(float(rec), 4),
                      "qps": round(args.nq / dt)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
