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
ti = np.load("/tmp/gt_1m_128d.npz")["ti"]

for m in (64, 128):
    t0=time.time()
    ivfpq = ann.build_ivf_pq_index(x, nlist=1024, m=m, seed=42)
    print(f"m={m} build {time.time()-t0:.1f}s", flush=True)
    for npb in [16, 32]:
        ai, _ = ivfpq.query(q, K, nprobe=npb, approx=True)
        rec = calculate_recall(ti, ai, K)
        t0=time.time()
        ai, _ = ivfpq.query(q, K, nprobe=npb, approx=True)
        dt = time.time()-t0
        print(f"m={m} nprobe={npb} approx: recall {rec:.4f} warm {dt:.2f}s -> {NQ/dt:.0f} QPS", flush=True)
    del ivfpq
