"""Gridsearch benchmark harness.

Equivalent of the reference's ``examples/gridsearch_*.rs`` + ``commons``
(``examples/commons/mod.rs``): generate a synthetic suite, compute exhaustive
ground truth, sweep index parameters, and print the standard table
(Method / Build ms / Query ms / Total ms / Recall@k / Mean dist ratio /
Size MB — print_results_size, commons/mod.rs:905-935).

Usage:
  python -m benchmarks.gridsearch --index ivf --n-samples 150000 --dim 32 \
      --n-clusters 25 --k 15 --data gaussian --distance euclidean

Timing notes: wall-clock timings include host work; on this environment the
chip sits behind a tunnel (~30 ms dispatch), so per-call latencies carry a
constant offset a real TPU host does not have.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root

import annsearch_tpu as ann
from annsearch_tpu.utils.data import generate_data, subsample_with_noise
from annsearch_tpu.utils.metrics import (
    calculate_mean_distance_ratio,
    calculate_recall,
)


def _run(name, build_fn, query_fn, q, k, ti, td, results, int_space=False,
         reps=2, build_reps=1):
    # first build pays any jit compile; with build_reps ≥ 2 take the min so
    # the table reports warm build cost (cold-compile rows are misleading:
    # same-config builds differed 25× run-to-run in the round-1 table)
    build_ms = float("inf")
    for _ in range(max(build_reps, 1)):
        t0 = time.perf_counter()
        index = build_fn()
        build_ms = min(build_ms, (time.perf_counter() - t0) * 1000)
    # warm the query path once (jit compile), then time ≥2 runs and take the
    # min — run-to-run variance through the device tunnel is large (±2×)
    query_fn(index, q[:8])
    query_ms = float("inf")
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        ai, ad = query_fn(index, q)
        query_ms = min(query_ms, (time.perf_counter() - t0) * 1000)
    rec = calculate_recall(ti, ai, k)
    mdr = (
        calculate_mean_distance_ratio(td, ad, k)
        if ad is not None and not int_space
        else float("nan")
    )
    size_mb = index.memory_usage_bytes() / 1e6
    results.append((name, build_ms, query_ms, rec, mdr, size_mb))
    print(
        f"{name:<48} {build_ms:>11,.0f} {query_ms:>11,.0f} "
        f"{build_ms + query_ms:>11,.0f} {rec:>9.4f} {mdr:>9.4f} "
        f"{size_mb:>9.2f}",
        flush=True,
    )


def _header(config: str):
    print("=" * 120)
    print(f"Benchmark: {config}")
    print("=" * 120)
    print(
        f"{'Method':<48} {'Build (ms)':>11} {'Query (ms)':>11} "
        f"{'Total (ms)':>11} {'Recall@k':>9} {'DistRatio':>9} {'Size MB':>9}"
    )
    print("-" * 120)


SWEEPS = {
    "exhaustive": lambda a: [("exhaustive", {})],
    "exhaustive-gpu": lambda a: [("exhaustive-gpu", {})],
    "ivf": lambda a: [
        (
            f"ivf{'-cert' if a.certify else ''} nl{nl} np{np_}",
            {"nlist": nl, "nprobe": np_},
        )
        for nl in a.nlist_sweep
        for np_ in a.nprobe_sweep
    ],
    "ivf-gpu": lambda a: [
        (f"ivf-gpu nl{nl} np{np_}", {"nlist": nl, "nprobe": np_})
        for nl in a.nlist_sweep
        for np_ in a.nprobe_sweep
    ],
    "kmknn": lambda a: [(f"kmknn nl{nl}", {"nlist": nl}) for nl in a.nlist_sweep],
    "annoy": lambda a: [
        (f"annoy nt{t} p{pr}", {"n_trees": t, "n_probes": pr})
        for t, pr in ((16, 2), (32, 4), (32, 8))
    ],
    "kdtree": lambda a: [
        (f"kdtree nt{t} p{pr}", {"n_trees": t, "n_probes": pr})
        for t, pr in ((16, 2), (32, 4))
    ],
    "balltree": lambda a: [
        (f"balltree b{b}", {"budget": b}) for b in (0.01, 0.05, 0.2)
    ],
    "lsh": lambda a: [
        (f"lsh t{t} b{b} p{p}", {"num_tables": t, "bits_per_hash": b, "n_probes": p})
        # reference-parity configs (benchmarks_standard.md LSH rows): few
        # bits at 150k — nb8 ≈ 256 buckets; probes recover the rest (deeper
        # hashes fragment hot buckets into many segments and scan slower)
        for t, b, p in ((2, 8, 4), (4, 8, 4), (8, 8, 4))
    ],
    "hnsw": lambda a: [
        (f"hnsw m{m} ef{ef}", {"m": m, "ef_search": ef})
        for m, ef in ((8, 50), (16, 100), (32, 200))
    ],
    "vamana": lambda a: [
        (f"vamana r{r}", {"r_degree": r}) for r in (16, 32, 64)
    ],
    "nndescent": lambda a: [
        (f"nndescent k{a.k} bw{bw}", {"beam": bw}) for bw in (32, 48, 64)
    ],
    "ivf-bf16": lambda a: [
        (f"ivf-bf16 nl{nl} np{np_}", {"nlist": nl, "nprobe": np_})
        for nl in a.nlist_sweep
        for np_ in a.nprobe_sweep
    ],
    "ivf-sq8": lambda a: [
        (f"ivf-sq8 nl{nl} np{np_}", {"nlist": nl, "nprobe": np_})
        for nl in a.nlist_sweep
        for np_ in a.nprobe_sweep
    ],
    "ivf-pq": lambda a: [
        (f"ivf-pq nl{nl} m{m} np{np_}", {"nlist": nl, "m": m, "nprobe": np_})
        for nl in a.nlist_sweep
        for m in a.m_sweep
        for np_ in a.nprobe_sweep
    ],
    "ivf-opq": lambda a: [
        (f"ivf-opq nl{nl} m{m} np{np_}", {"nlist": nl, "m": m, "nprobe": np_})
        for nl in a.nlist_sweep
        for m in a.m_sweep
        for np_ in a.nprobe_sweep
    ],
    "exhaustive-bf16": lambda a: [("exhaustive-bf16", {})],
    "exhaustive-sq8": lambda a: [("exhaustive-sq8", {})],
    "exhaustive-pq": lambda a: [
        (f"exhaustive-pq m{m}", {"m": m}) for m in a.m_sweep
    ],
    "binary": lambda a: [
        (f"binary {mode} {b}b rr{rr}", {"binarisation": mode, "n_bits": b, "rerank": rr})
        for mode in ("simhash", "pca")
        for b in (128, 256)
        for rr in (None, "exact")
    ],
    "rabitq": lambda a: [
        (f"rabitq rf{rf}", {"rerank": "exact", "rerank_factor": rf})
        for rf in (5, 10, 20)
    ],
    "ivf-binary": lambda a: [
        (
            f"ivf-binary nl{nl} {mode} {b}b np{np_} rr{rr}",
            {"nlist": nl, "n_bits": b, "nprobe": np_, "rerank": rr,
             "binarisation": mode},
        )
        # the reference's IVF-binary tables sweep the pca binariser
        # (benchmarks_binary.md "-pca" rows) as well as random projections
        for mode in ("simhash", "pca")
        for nl in a.nlist_sweep[:2]
        for b in (128, 256)
        for np_ in a.nprobe_sweep
        for rr in (None, "exact")
    ],
    "ivf-rabitq": lambda a: [
        (
            f"ivf-rabitq nl{nl} np{np_} rf{rf}",
            {"nlist": nl, "nprobe": np_,
             "rerank": "exact" if rf else None, "rerank_factor": max(rf, 1)},
        )
        for nl in a.nlist_sweep[:2]
        for np_ in a.nprobe_sweep
        for rf in (0, 10, 20)
    ],
}

#: index kinds whose reported distances live in quantised integer space —
#: the f32 distance ratio is meaningless there (reference prints NaN)
_INT_SPACE_KINDS = {"ivf-sq8", "exhaustive-sq8"}


def make_runner(kind: str, args, x):
    """Returns (build_fn, query_fn) factories per sweep config."""
    dist = args.distance
    seed = args.seed
    k = args.k

    def r(cfg):
        if kind == "exhaustive":
            return (
                lambda: ann.build_exhaustive_index(x, dist),
                lambda ix, qq: ann.query_exhaustive_index(qq, ix, k, return_dist=True),
            )
        if kind == "ivf":
            return (
                lambda: ann.build_ivf_index(x, nlist=cfg.get("nlist"), dist_metric=dist, seed=seed),
                lambda ix, qq: ann.query_ivf_index(qq, ix, k, nprobe=cfg.get("nprobe"), return_dist=True, certify=args.certify),
            )
        if kind == "exhaustive-gpu":
            return (
                lambda: ann.build_exhaustive_index_gpu(x, dist),
                lambda ix, qq: ann.query_exhaustive_index_gpu(qq, ix, k, return_dist=True),
            )
        if kind == "ivf-gpu":
            return (
                lambda: ann.build_ivf_index_gpu(x, nlist=cfg.get("nlist"), dist_metric=dist, seed=seed),
                lambda ix, qq: ann.query_ivf_index_gpu(qq, ix, k, nprobe=cfg.get("nprobe"), return_dist=True),
            )
        if kind == "kmknn":
            return (
                lambda: ann.build_kmknn_index(x, dist, nlist=cfg.get("nlist"), seed=seed),
                lambda ix, qq: ann.query_kmknn_index(qq, ix, k, return_dist=True),
            )
        if kind == "annoy":
            return (
                lambda: ann.build_annoy_index(x, dist, n_trees=cfg["n_trees"], seed=seed),
                lambda ix, qq: ann.query_annoy_index(qq, ix, k, n_probes=cfg.get("n_probes", 2), return_dist=True),
            )
        if kind == "kdtree":
            return (
                lambda: ann.build_kd_tree_index(x, dist, n_trees=cfg["n_trees"], seed=seed),
                lambda ix, qq: ann.query_kd_tree_index(qq, ix, k, n_probes=cfg.get("n_probes", 2), return_dist=True),
            )
        if kind == "balltree":
            return (
                lambda: ann.build_balltree_index(x, dist, seed=seed),
                lambda ix, qq: ann.query_balltree_index(qq, ix, k, budget=cfg["budget"], return_dist=True),
            )
        if kind == "lsh":
            return (
                lambda: ann.build_lsh_index(x, dist, num_tables=cfg["num_tables"], bits_per_hash=cfg["bits_per_hash"], seed=seed),
                lambda ix, qq: ann.query_lsh_index(qq, ix, k, n_probes=cfg["n_probes"], return_dist=True),
            )
        if kind == "hnsw":
            return (
                lambda: ann.build_hnsw_index(x, dist, m=cfg["m"], seed=seed),
                lambda ix, qq: ann.query_hnsw_index(qq, ix, k, ef_search=cfg["ef_search"], return_dist=True),
            )
        if kind == "vamana":
            return (
                lambda: ann.build_vamana_index(x, dist, r_degree=cfg["r_degree"], seed=seed),
                lambda ix, qq: ann.query_vamana_index(qq, ix, k, return_dist=True),
            )
        if kind == "nndescent":
            return (
                lambda: ann.build_nndescent_index(x, dist, k=k, seed=seed),
                lambda ix, qq: ann.query_nndescent_index(qq, ix, k, beam=cfg["beam"], return_dist=True),
            )
        if kind == "ivf-bf16":
            return (
                lambda: ann.build_ivf_bf16_index(x, nlist=cfg.get("nlist"), dist_metric=dist, seed=seed),
                lambda ix, qq: ann.query_ivf_bf16_index(qq, ix, k, nprobe=cfg.get("nprobe"), return_dist=True),
            )
        if kind == "ivf-sq8":
            return (
                lambda: ann.build_ivf_sq8_index(x, nlist=cfg.get("nlist"), dist_metric=dist, seed=seed),
                lambda ix, qq: ann.query_ivf_sq8_index(qq, ix, k, nprobe=cfg.get("nprobe"), return_dist=True),
            )
        if kind == "ivf-pq":
            return (
                lambda: ann.build_ivf_pq_index(x, nlist=cfg.get("nlist"), m=cfg["m"], dist_metric=dist, seed=seed),
                lambda ix, qq: ann.query_ivf_pq_index(qq, ix, k, nprobe=cfg.get("nprobe"), return_dist=True),
            )
        if kind == "ivf-opq":
            return (
                lambda: ann.build_ivf_opq_index(x, nlist=cfg.get("nlist"), m=cfg["m"], dist_metric=dist, seed=seed),
                lambda ix, qq: ann.query_ivf_opq_index(qq, ix, k, nprobe=cfg.get("nprobe"), return_dist=True),
            )
        if kind == "exhaustive-bf16":
            return (
                lambda: ann.build_exhaustive_bf16_index(x, dist),
                lambda ix, qq: ann.query_exhaustive_bf16_index(qq, ix, k, return_dist=True),
            )
        if kind == "exhaustive-sq8":
            return (
                lambda: ann.build_exhaustive_sq8_index(x, dist),
                lambda ix, qq: ann.query_exhaustive_sq8_index(qq, ix, k, return_dist=True),
            )
        if kind == "exhaustive-pq":
            return (
                lambda: ann.build_exhaustive_pq_index(x, m=cfg["m"], dist_metric=dist, seed=seed),
                lambda ix, qq: ann.query_exhaustive_pq_index(qq, ix, k, return_dist=True),
            )
        if kind == "binary":
            return (
                lambda: ann.build_exhaustive_index_binary(x, dist, n_bits=cfg["n_bits"], binarisation=cfg["binarisation"], seed=seed),
                lambda ix, qq: ann.query_exhaustive_index_binary(qq, ix, k, rerank=cfg["rerank"], return_dist=True),
            )
        if kind == "rabitq":
            return (
                lambda: ann.build_exhaustive_index_rabitq(x, dist, seed=seed),
                lambda ix, qq: ann.query_exhaustive_index_rabitq(qq, ix, k, rerank=cfg["rerank"], rerank_factor=cfg["rerank_factor"], return_dist=True),
            )
        if kind == "ivf-binary":
            return (
                lambda: ann.build_ivf_index_binary(x, dist, nlist=cfg.get("nlist"), n_bits=cfg["n_bits"], binarisation=cfg.get("binarisation", "simhash"), seed=seed),
                lambda ix, qq: ann.query_ivf_index_binary(qq, ix, k, nprobe=cfg.get("nprobe"), rerank=cfg["rerank"], return_dist=True),
            )
        if kind == "ivf-rabitq":
            return (
                lambda: ann.build_ivf_index_rabitq(x, dist, nlist=cfg.get("nlist"), seed=seed),
                lambda ix, qq: ann.query_ivf_index_rabitq(qq, ix, k, nprobe=cfg.get("nprobe"), rerank=cfg["rerank"], rerank_factor=cfg["rerank_factor"], return_dist=True),
            )
        raise ValueError(f"unknown index kind {kind!r}")

    return r


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True, choices=sorted(SWEEPS))
    p.add_argument("--n-samples", type=int, default=150_000)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--n-clusters", type=int, default=25)
    p.add_argument("--k", type=int, default=15)
    p.add_argument("--n-queries", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--distance", default="euclidean", choices=["euclidean", "cosine"])
    p.add_argument(
        "--data", default="gaussian",
        choices=["gaussian", "correlated", "lowrank", "quantisation"],
    )
    p.add_argument("--intrinsic-dim", type=int, default=16)
    p.add_argument("--spectral-decay", type=float, default=1.5)
    p.add_argument("--nlist-sweep", type=int, nargs="+", default=None)
    p.add_argument("--nprobe-sweep", type=int, nargs="+", default=None)
    p.add_argument("--m-sweep", type=int, nargs="+", default=None)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--build-reps", type=int, default=1)
    p.add_argument(
        "--certify", action="store_true",
        help="ivf only: run the exact tier's probe certificate "
        "(provably exact top-k; nprobe = starting probe count)",
    )
    args = p.parse_args(argv)

    if args.n_queries is None:
        args.n_queries = max(args.n_samples // 10, 1)
    if args.nlist_sweep is None:
        root = int(np.sqrt(args.n_samples))
        args.nlist_sweep = [root // 2, root, 2 * root]
    if args.nprobe_sweep is None:
        args.nprobe_sweep = [4, 8, 16, 32]
    if args.m_sweep is None:
        # m == dim is the int8 fast-scan point (scalar sub-codebooks)
        args.m_sweep = list(dict.fromkeys(
            m for m in (8, 16, 32, 64, args.dim)
            if args.dim % m == 0 and m >= 8
        ))

    x, labels = generate_data(
        args.data, args.n_samples, args.dim, args.n_clusters, args.seed,
        intrinsic_dim=args.intrinsic_dim, spectral_decay=args.spectral_decay,
    )
    q = subsample_with_noise(x, args.n_queries, args.seed)
    if args.certify:
        # certified rows measure in f64 end-to-end: an f32-grade GT flips
        # sub-grain ties against ANY f32 query path (~4e-4 of recall noise
        # at the 500k scale workload), so a provably-exact tier still
        # reads 0.9996 against it. f64 data → f64 pool-rescored GT and
        # f64-exact certified queries — recall 1.0000 is then meaningful.
        x = x.astype(np.float64)
        q = q.astype(np.float64)

    print("computing exhaustive ground truth...", flush=True)
    exact = ann.build_exhaustive_index(x, args.distance)
    ti, td = exact.query(q, args.k)
    del exact

    config = (
        f"{args.index} | {args.data} {args.n_samples}x{args.dim} "
        f"{args.n_clusters}cl | {args.n_queries} queries | k={args.k} | "
        f"{args.distance}"
    )
    _header(config)
    results = []
    runner = make_runner(args.index, args, x)
    for name, cfg in SWEEPS[args.index](args):
        build_fn, query_fn = runner(cfg)
        try:
            _run(
                name, build_fn, query_fn, q, args.k, ti, td, results,
                int_space=args.index in _INT_SPACE_KINDS, reps=args.reps,
                build_reps=args.build_reps,
            )
        except Exception as e:  # keep sweeping past OOM/param errors
            print(f"{name:<48} FAILED: {e}", flush=True)
    print("-" * 120)
    return results


if __name__ == "__main__":
    main()
