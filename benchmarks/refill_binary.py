"""Re-run ONLY the binary quantisation suite and splice the fresh rows
into ``docs/benchmarks_tpu.md`` (replacing everything from the
"## Binary quantisation suite" header to the next "## " header or EOF).

Exists because the binary suite is the one section whose synthetic
generator ("correlated") changed after a full fill run — re-running the
whole fill costs hours of chip time for identical non-binary rows.

  python -m benchmarks.refill_binary
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from benchmarks.fill_benchmarks import BINARY_BASE, BINARY_CONFIGS
from benchmarks.gridsearch import main as gridsearch_main

HEADER = "## Binary quantisation suite"


def main():
    lines = [
        "## Binary quantisation suite (50k×256d, k=15 — the reference's "
        "`benchmarks_binary.md` workload)",
        "",
        "Size MB here includes the device-resident f32 rerank store "
        "(51.2 MB at this workload) that the exact-rerank tier scores "
        "against; the reference keeps the same vectors in an on-disk "
        "mmap store it does NOT count in its Size column "
        "(vec_store.rs; exhaustive_binary.rs:575-579 counts codes + "
        "binariser only). Codes+binariser alone are ~1.9 MB at 256 "
        "bits — parity with the reference's 1.78 MB.",
        "",
        "| Method | Data | Build (ms) | Query (ms) | Recall@k | "
        "Dist ratio | Size MB |",
        "|---|---|---|---|---|---|---|",
    ]
    os.environ["ANNSEARCH_NO_EXACT_FALLBACK"] = "1"
    try:
        for kind, data, extra in BINARY_CONFIGS:
            print(f"=== binary-suite {kind} ({data}) ===", flush=True)
            try:
                results = gridsearch_main(
                    ["--index", kind, "--data", data] + BINARY_BASE + extra
                )
            except Exception as e:
                print(f"binary-suite {kind} FAILED: {e}", flush=True)
                continue
            for name, build_ms, query_ms, rec, mdr, size_mb in results:
                lines.append(
                    f"| {name} | {data} | {build_ms:,.0f} | {query_ms:,.0f} | "
                    f"{rec:.4f} | {mdr:.4f} | {size_mb:.2f} |"
                )
    finally:
        del os.environ["ANNSEARCH_NO_EXACT_FALLBACK"]

    with open("docs/benchmarks_tpu.md") as f:
        doc = f.read()
    start = doc.index(HEADER)
    m = re.search(r"^## ", doc[start + len(HEADER):], re.M)
    end = start + len(HEADER) + (m.start() if m else len(doc))
    doc = doc[:start] + "\n".join(lines) + "\n\n" + doc[end:]
    with open("docs/benchmarks_tpu.md", "w") as f:
        f.write(doc)
    print("binary section refreshed", flush=True)


if __name__ == "__main__":
    main()
