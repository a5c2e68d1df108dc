"""Re-run ONLY the forced-native-path rows and splice them into
``docs/benchmarks_tpu.md`` (the block between the "At this workload
size…" paragraph and the next "## " header). Companion to
refill_binary.py / refill_scale.py.

  python -m benchmarks.refill_native
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from benchmarks.gridsearch import main as gridsearch_main

MARKER = "At this workload size"

NATIVE_CONFIGS = [
    ("kmknn", ["--nlist-sweep", "387"]),
    ("annoy", []),
    ("kdtree", []),
    ("balltree", []),
    ("hnsw", []),
    ("vamana", []),
    ("nndescent", []),
    ("lsh", []),
]

BASE = [
    "--n-samples", "150000", "--dim", "32", "--n-clusters", "25",
    "--k", "15", "--build-reps", "2",
]


def main():
    lines = [
        "At this workload size every index that keeps full-precision "
        "rows answers queries through the small-regime exact MXU scan "
        "(recall 1.0 by construction — see "
        "`models/base.BRUTE_QUERY_FLOP_BUDGET`). The rows below force "
        "the native query algorithms (`ANNSEARCH_NO_EXACT_FALLBACK=1`) "
        "to show structure quality:",
        "",
        "| Method (native path) | Build (ms) | Query (ms) | Recall@k | "
        "Dist ratio | Size MB |",
        "|---|---|---|---|---|---|",
    ]
    os.environ["ANNSEARCH_NO_EXACT_FALLBACK"] = "1"
    try:
        for kind, extra in NATIVE_CONFIGS:
            print(f"=== native {kind} ===", flush=True)
            try:
                results = gridsearch_main(["--index", kind] + BASE + extra)
            except Exception as e:
                print(f"native {kind} FAILED: {e}", flush=True)
                continue
            for name, build_ms, query_ms, rec, mdr, size_mb in results:
                lines.append(
                    f"| {name} | {build_ms:,.0f} | {query_ms:,.0f} | "
                    f"{rec:.4f} | {mdr:.4f} | {size_mb:.2f} |"
                )
    finally:
        del os.environ["ANNSEARCH_NO_EXACT_FALLBACK"]

    with open("docs/benchmarks_tpu.md") as f:
        doc = f.read()
    start = doc.index(MARKER)
    m = re.search(r"^## ", doc[start:], re.M)
    end = start + (m.start() if m else len(doc) - start)
    doc = doc[:start] + "\n".join(lines) + "\n\n" + doc[end:]
    with open("docs/benchmarks_tpu.md", "w") as f:
        f.write(doc)
    print("native section refreshed", flush=True)


if __name__ == "__main__":
    main()
