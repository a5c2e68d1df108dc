"""Re-run ONLY the scale suite and splice the fresh rows into
``docs/benchmarks_tpu.md`` (replacing from the "## Scale suite" header to
the next "## " header or EOF). Companion to refill_binary.py.

  python -m benchmarks.refill_scale
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from benchmarks.fill_benchmarks import SCALE_CONFIGS
from benchmarks.gridsearch import main as gridsearch_main

HEADER = "## Scale suite"


def main():
    lines = [
        "## Scale suite (lowrank 64d, k=15 — the reference's "
        "`benchmarks_gpu.md` 250k/500k workloads)",
        "",
        "| Method | n | Build (ms) | Query (ms) | Recall@k | "
        "Dist ratio | Size MB |",
        "|---|---|---|---|---|---|---|",
    ]
    for kind, n, extra in SCALE_CONFIGS:
        print(f"=== scale {kind} ({n}) ===", flush=True)
        try:
            results = gridsearch_main(
                ["--index", kind, "--data", "lowrank",
                 "--n-samples", n, "--dim", "64", "--k", "15",
                 "--intrinsic-dim", "16", "--build-reps", "2"] + extra
            )
        except Exception as e:
            print(f"scale {kind} FAILED: {e}", flush=True)
            continue
        for name, build_ms, query_ms, rec, mdr, size_mb in results:
            lines.append(
                f"| {name} | {n} | {build_ms:,.0f} | {query_ms:,.0f} | "
                f"{rec:.4f} | {mdr:.4f} | {size_mb:.2f} |"
            )

    with open("docs/benchmarks_tpu.md") as f:
        doc = f.read()
    start = doc.index(HEADER)
    m = re.search(r"^## ", doc[start + len(HEADER):], re.M)
    end = start + len(HEADER) + (m.start() if m else len(doc))
    doc = doc[:start] + "\n".join(lines) + "\n\n" + doc[end:]
    with open("docs/benchmarks_tpu.md", "w") as f:
        f.write(doc)
    print("scale section refreshed", flush=True)


if __name__ == "__main__":
    main()
