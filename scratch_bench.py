import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import numpy as np
import annsearch_tpu as ann
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise
from annsearch_tpu.utils.metrics import calculate_recall

N, D, NC, NQ, K = 1_000_000, 128, 100, 10_000, 10
t0=time.time()
x, _ = generate_clustered_data(N, D, NC, seed=42)
q = subsample_with_noise(x, NQ, seed=42)
print(f"datagen {time.time()-t0:.1f}s", flush=True)

t0=time.time()
exact = ann.build_exhaustive_index(x)
ti, _ = ann.query_exhaustive_index(q, exact, K, return_dist=True)
print(f"exact GT {time.time()-t0:.1f}s", flush=True)
del exact

t0=time.time()
ivfpq = ann.build_ivf_pq_index(x, nlist=1024, m=32, seed=42)
print(f"ivf-pq build {time.time()-t0:.1f}s cell_cap={ivfpq.cell_cap}", flush=True)

for npb in [8, 16, 32]:
    t0=time.time()
    ai, _ = ann.query_ivf_pq_index(q, ivfpq, K, nprobe=npb, return_dist=True)
    dt = time.time()-t0
    rec = calculate_recall(ti, ai, K)
    print(f"nprobe={npb}: first {dt:.2f}s recall {rec:.4f}", flush=True)
    t0=time.time()
    ai, _ = ann.query_ivf_pq_index(q, ivfpq, K, nprobe=npb, return_dist=True)
    dt = time.time()-t0
    print(f"nprobe={npb}: warm {dt:.2f}s -> {NQ/dt:.0f} QPS", flush=True)
