import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import numpy as np
import annsearch_tpu as ann
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise
from annsearch_tpu.utils.metrics import calculate_recall

N, D, NC, NQ, K = 1_000_000, 128, 100, 10_000, 10
x, _ = generate_clustered_data(N, D, NC, seed=42)
q = subsample_with_noise(x, NQ, seed=42)

# cache GT to disk (exact GT is expensive at HIGHEST precision)
import os
gt_path = "/tmp/gt_1m_128d.npz"
if os.path.exists(gt_path):
    ti = np.load(gt_path)["ti"]
    print("GT loaded from cache", flush=True)
else:
    t0=time.time()
    exact = ann.build_exhaustive_index(x)
    ti, _ = ann.query_exhaustive_index(q, exact, K, return_dist=True)
    np.savez(gt_path, ti=ti)
    print(f"exact GT {time.time()-t0:.1f}s", flush=True)
    del exact

for m in [64]:
    t0=time.time()
    ivfpq = ann.build_ivf_pq_index(x, nlist=1024, m=m, seed=42)
    print(f"ivf-pq m={m} build {time.time()-t0:.1f}s seg_size={ivfpq.seg_size}", flush=True)
    for npb in [8, 16, 32]:
        ai, _ = ann.query_ivf_pq_index(q, ivfpq, K, nprobe=npb, return_dist=True)
        rec = calculate_recall(ti, ai, K)
        t0=time.time()
        ai, _ = ann.query_ivf_pq_index(q, ivfpq, K, nprobe=npb, return_dist=True)
        dt = time.time()-t0
        print(f"m={m} nprobe={npb}: recall {rec:.4f} warm {dt:.2f}s -> {NQ/dt:.0f} QPS", flush=True)
    del ivfpq
